"""Generate an ImageNet-C-layout corrupted benchmark from clean eval shards.

The reference's mCE evaluation assumes the pre-corrupted ImageNet-C tarballs
(~75 GB) are on disk (reference:eval protocol, SURVEY.md §3.4). This CLI makes
the benchmark self-contained: it reads clean validation TFRecords, applies the
clean-eval geometry (resize shorter side to ``resize_min``, central crop to
``image_size`` — corruption is defined on the *cropped* pixels, which is what
the standard 224x224 distribution stores), corrupts each image with
``axcnn.data.corruptions`` (published Hendrycks & Dietterich algorithms), and
writes ``<output_dir>/<corruption>/<severity>/<prefix>-*`` shards in the exact
layout ``axcnn.eval.imagenet_c.run_imagenet_c`` consumes.

Labels/class-text/filenames are carried over unchanged. Images are re-encoded
as JPEG at ``--jpeg_quality`` (default 100, matching the distribution's JPEG
storage while adding minimal extra artifact; ``jpeg_compression``'s own
low-quality encode is already baked into its output pixels).

Determinism: each (corruption, severity, record) triple gets its own
``np.random.Generator`` seeded from ``--seed`` and the corruption's STABLE
index in ``CORRUPTION_FNS`` (not its position in the requested subset) —
output is independent of sharding, iteration order, and which subset of
corruptions a run requests, so any subset regenerates bit-identically.

Example:
    python -m axcnn.data.build_imagenet_c \
        --data_dir=/data/imagenet/rec --output_dir=/data/imagenet_c \
        --corruptions=gaussian_noise,fog --severities=1,3,5
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os

import numpy as np
from PIL import Image

from axcnn.data.corruptions import CORRUPTION_FNS, corrupt
from axcnn.data.preprocessing import preprocess_eval
from axcnn.data.tfrecord import (TFRecordReader, TFRecordWriter, list_shards,
                                 make_example, parse_example)


def _encode_jpeg(img_u8: np.ndarray, quality: int) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def build_corrupted_set(data_dir: str, output_dir: str, *,
                        prefix: str = "validation", image_size: int = 224,
                        resize_min: int = 256, corruptions=None,
                        severities=(1, 2, 3, 4, 5), jpeg_quality: int = 100,
                        seed: int = 0, progress=print) -> int:
    """Corrupt every record of ``<data_dir>/<prefix>-*`` for every
    (corruption, severity); returns total examples written."""
    corruptions = list(corruptions or CORRUPTION_FNS)
    for name in corruptions:
        if name not in CORRUPTION_FNS:
            raise ValueError(f"unknown corruption {name!r}")
    # seed by the corruption's stable position in CORRUPTION_FNS so a subset
    # run regenerates the same pixels as the full build
    stable_index = {n: i for i, n in enumerate(CORRUPTION_FNS)}
    shards = list_shards(data_dir, prefix)
    total = 0
    # One decode+resize+crop per record, reused across all (corruption,
    # severity) outputs — a full build is 75 variants per record and the
    # clean-pixel preprocessing dominated generation time on a 1-core host.
    with contextlib.ExitStack() as stack:
        writers = {}
        for name in corruptions:
            for sev in severities:
                out_dir = os.path.join(output_dir, name, str(sev))
                os.makedirs(out_dir, exist_ok=True)
                writers[(name, sev)] = [
                    stack.enter_context(TFRecordWriter(os.path.join(
                        out_dir, f"{prefix}-{si:05d}-of-{len(shards):05d}")))
                    for si in range(len(shards))]
        rec_idx = 0
        for si, shard in enumerate(shards):
            for payload in TFRecordReader(shard):
                feats = parse_example(payload)
                clean = preprocess_eval(
                    bytes(feats["image/encoded"][0]),
                    image_size=image_size, resize_min=resize_min)
                out_feats = {k: v for k, v in feats.items()
                             if k != "image/encoded"}
                for name in corruptions:
                    for sev in severities:
                        rng = np.random.default_rng(
                            [seed, stable_index[name], sev, rec_idx])
                        bad = corrupt(clean, name, sev, rng)
                        out_feats["image/encoded"] = [
                            _encode_jpeg(bad, jpeg_quality)]
                        writers[(name, sev)][si].write(
                            make_example(out_feats))
                        total += 1
                rec_idx += 1
    for name in corruptions:
        for sev in severities:
            progress(f"{name}/{sev}: {rec_idx} examples "
                     f"-> {os.path.join(output_dir, name, str(sev))}")
    return total


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_dir", required=True,
                   help="directory with clean <prefix>-* TFRecord shards")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--prefix", default="validation")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--resize_min", type=int, default=256)
    p.add_argument("--corruptions", default=",".join(CORRUPTION_FNS),
                   help="comma-separated subset of the 15 corruption names")
    p.add_argument("--severities", default="1,2,3,4,5")
    p.add_argument("--jpeg_quality", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    n = build_corrupted_set(
        args.data_dir, args.output_dir, prefix=args.prefix,
        image_size=args.image_size, resize_min=args.resize_min,
        corruptions=[c for c in args.corruptions.split(",") if c],
        severities=[int(s) for s in args.severities.split(",") if s],
        jpeg_quality=args.jpeg_quality, seed=args.seed)
    print(f"wrote {n} corrupted examples to {args.output_dir}")


if __name__ == "__main__":
    main()
