"""Frozen bench-output contract (VERDICT r4 Weak #5 / next-round #4).

``vs_baseline`` changed meaning three times in rounds 1-4 (assumed-TF1
ratio -> fraction of spec speed-of-light -> fraction of MEASURED-achievable
speed-of-light). Each change was an honesty fix, but it made the BENCH_r*
series non-self-comparable on its headline field. As of round 5 the
contract is FROZEN:

    value       = absolute measured train img/s/chip
    vs_baseline = details["fraction_of_achievable"]

This test pins the assembly logic (bench.assemble_output) and the key set
so any future semantic drift fails CI instead of silently re-basing the
series. It does NOT run the benchmark (that needs the chip); it feeds
synthetic details through the same code path main() prints.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _details():
    # the full r4 key set — the frozen reference schema
    return {
        "measured_hbm_gbps": 631.3, "measured_tflops_bf16": 167.5,
        "hbm_fraction_of_spec": 0.771, "mxu_fraction_of_spec": 0.85,
        "speed_of_light_achievable_ms": 62.14,
        "fraction_of_achievable": 0.784,
        "train_ips": 1614.9, "infer_ips": 6327.8, "infer_int8_ips": 6551.9,
        "step_ms": 79.26, "train_gflop_per_step": 5998.6,
        "costmodel_gb_per_step": 67.25, "graph_gb_per_step": 39.23,
        "tflops": 75.7, "mfu": 0.384, "hbm_gbps_graph": 495.0,
        "hbm_utilization_graph": 0.604,
        "hbm_utilization_costmodel_overcounted": 1.036,
        "speed_of_light_ms": 47.9, "fraction_of_speed_of_light": 0.604,
        "loader_fed_train_ips": 245.0, "loader_fed_window_min": 145.5,
        "loader_fed_window_max": 329.9, "loader_ips": 502.1,
        "loader_ips_per_core": 502.1, "host_cores": 1,
        "loader_fed_echo4_train_ips": 1360.5,
    }


class TestFrozenContract:
    def test_headline_keys(self):
        out = bench.assemble_output(_details())
        assert set(out) == {"metric", "value", "unit", "vs_baseline",
                            "details"}
        assert out["metric"] == \
            "assemble_resnet50_train_images_per_sec_per_chip"
        assert out["unit"] == "images/sec/chip"

    def test_value_is_absolute_train_ips(self):
        d = _details()
        out = bench.assemble_output(d)
        assert out["value"] == d["train_ips"]

    def test_vs_baseline_is_fraction_of_achievable(self):
        d = _details()
        out = bench.assemble_output(d)
        assert out["vs_baseline"] == d["fraction_of_achievable"]
        # NOT the spec fraction, NOT the assumed-TF1 ratio
        assert out["vs_baseline"] != d["fraction_of_speed_of_light"]
        assert out["vs_baseline"] < 2.0  # a ratio-to-TF1 would be ~9.5

    def test_legacy_fields_preserved_in_details(self):
        out = bench.assemble_output(_details())
        det = out["details"]
        # the r1 and r2/r3 headline meanings survive as details keys
        assert det["vs_assumed_tf1_v100_170ips"] == round(
            1614.9 / bench.BASELINE_TRAIN_IPS, 3)
        assert det["fraction_of_speed_of_light"] == 0.604
        assert "baseline_note" in det

    def test_fallback_without_calibration(self):
        # if the achievable-roofline calibration ever fails, the spec
        # fraction is the documented fallback — never the TF1 ratio
        d = _details()
        del d["fraction_of_achievable"]
        out = bench.assemble_output(d)
        assert out["vs_baseline"] == d["fraction_of_speed_of_light"]

    def test_r4_details_schema_superset(self):
        # every r4 details key must keep existing (additions are fine,
        # removals/renames re-base the series)
        out = bench.assemble_output(_details())
        missing = set(_details()) - set(out["details"])
        assert not missing, f"dropped details keys: {missing}"

    def test_output_is_one_json_line(self):
        line = json.dumps(bench.assemble_output(_details()))
        assert "\n" not in line
        assert json.loads(line)["value"] == 1614.9
