"""Raw image folders → sharded TFRecords (reference ``datasets/`` tooling,
SURVEY.md §2 item 11; Inception ``build_imagenet_data`` lineage).

Layout expected: ``root/<split>/<class_name>/*.jpg``. Classes are sorted
lexicographically; ImageNet labels are 1-indexed (0 = background) matching
the reference's 1001-way head.

Usage:
    python -m axcnn.data.build_tfrecords --input_dir=... --output_dir=... \
        --split=train --num_shards=128
"""

from __future__ import annotations

import argparse
import os

from axcnn.data.tfrecord import TFRecordWriter, make_example

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def collect_images(split_dir: str, *, label_offset: int = 1):
    classes = sorted(
        d for d in os.listdir(split_dir)
        if os.path.isdir(os.path.join(split_dir, d))
    )
    items = []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(split_dir, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(IMAGE_EXTS):
                items.append((os.path.join(cdir, fname), idx + label_offset, cls))
    return items, classes


def write_shards(items, output_dir: str, prefix: str, num_shards: int, *,
                 shuffle_seed: int | None = 0):
    os.makedirs(output_dir, exist_ok=True)
    if shuffle_seed is not None:
        import numpy as np

        rng = np.random.default_rng(shuffle_seed)
        items = list(items)
        rng.shuffle(items)
    per_shard = -(-len(items) // num_shards)
    n = 0
    for s in range(num_shards):
        path = os.path.join(output_dir, f"{prefix}-{s:05d}-of-{num_shards:05d}")
        with TFRecordWriter(path) as w:
            for fpath, label, cls in items[s * per_shard:(s + 1) * per_shard]:
                with open(fpath, "rb") as f:
                    data = f.read()
                w.write(make_example({
                    "image/encoded": [data],
                    "image/class/label": [label],
                    "image/class/text": [cls.encode()],
                    "image/filename": [os.path.basename(fpath).encode()],
                }))
                n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--prefix", default=None,
                   help="shard filename prefix (default: 'train'/'validation')")
    p.add_argument("--num_shards", type=int, default=128)
    p.add_argument("--label_offset", type=int, default=1)
    args = p.parse_args(argv)

    prefix = args.prefix or ("validation" if args.split.startswith("val") else args.split)
    items, classes = collect_images(
        os.path.join(args.input_dir, args.split), label_offset=args.label_offset)
    n = write_shards(items, args.output_dir, prefix, args.num_shards,
                     shuffle_seed=0 if args.split == "train" else None)
    print(f"wrote {n} examples / {len(classes)} classes to {args.output_dir}")


if __name__ == "__main__":
    main()
