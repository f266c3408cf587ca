"""Profiling tooling tests: xplane wire parser + HLO traffic accounting
(the evidence pipeline behind docs/DESIGN.md's profiler-truth roofline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestHloAccounting:
    def test_shape_bytes(self):
        from scripts.profile_roofline import shape_bytes

        assert shape_bytes("f32[128,4]{1,0}") == 128 * 4 * 4
        assert shape_bytes("bf16[2,3,4]{2,1,0}") == 48
        assert shape_bytes("(f32[256]{0}, bf16[8,8]{1,0})") == 1024 + 128
        assert shape_bytes("pred[16]{0}") == 16
        assert shape_bytes("token[]") == 0

    def test_parse_entry_and_traffic(self):
        from scripts.profile_roofline import parse_entry, graph_traffic

        hlo = """HloModule m

%fused_computation (p: f32[64,64]) -> f32[64,64] {
  %p = f32[64,64]{1,0} parameter(0)
  ROOT %n = f32[64,64]{1,0} negate(%p)
}

ENTRY %main (a: f32[64,64], b: f32[64,64]) -> f32[64,64] {
  %a = f32[64,64]{1,0} parameter(0)
  %b = f32[64,64]{1,0} parameter(1)
  %dot.1 = f32[64,64]{1,0} dot(%a, %b), lhs_contracting_dims={1}
  ROOT %fusion.1 = f32[64,64]{1,0} fusion(%dot.1), kind=kLoop, calls=%fused_computation
}
"""
        instrs, sizes = parse_entry(hlo)
        names = [i["name"] for i in instrs]
        assert "dot.1" in names and "fusion.1" in names
        total, per = graph_traffic(instrs, sizes)
        buf = 64 * 64 * 4
        # dot reads a+b writes out; fusion reads dot writes out; params skipped
        assert per["dot.1"] == 3 * buf
        assert per["fusion.1"] == 2 * buf
        assert total == 5 * buf

    def test_tuple_layout_parens_and_memory_spaces(self):
        """TPU HLO realities the round-3 parser rewrite fixed: tuple result
        types whose layouts contain nested parens (multi-output conv+BN-stats
        fusions), VMEM-resident buffers (S(1)) that must not count as HBM
        traffic, and async copy/slice transfers counted once."""
        from scripts.profile_roofline import (parse_entry, graph_traffic,
                                              hbm_bytes, tuple_elements)

        assert hbm_bytes("bf16[128,256]{1,0:T(8,128)(2,1)}") == 128 * 256 * 2
        assert hbm_bytes("bf16[128,256]{1,0:T(8,128)(2,1)S(1)}") == 0
        assert tuple_elements(
            "(bf16[2,2]{1,0:T(8,128)(2,1)S(1)}, u32[]{:S(2)})") == [
                "bf16[2,2]{1,0:T(8,128)(2,1)S(1)}", "u32[]{:S(2)}"]

        hlo = """HloModule m

ENTRY %main (a: f32[64,64]) -> f32[64,64] {
  %a = f32[64,64]{1,0:T(8,128)} parameter(0)
  %copy-start.1 = (f32[64,64]{1,0:T(8,128)S(1)}, f32[64,64]{1,0:T(8,128)}, u32[]{:S(2)}) copy-start(%a)
  %copy-done.1 = f32[64,64]{1,0:T(8,128)S(1)} copy-done(%copy-start.1)
  %slice-start.1 = ((f32[64,64]{1,0:T(8,128)}), f32[32,64]{1,0:T(8,128)S(1)}, s32[]{:S(2)}) async-start(%a), calls=%async_computation.1
  %slice-done.1 = f32[32,64]{1,0:T(8,128)S(1)} async-done(%slice-start.1)
  ROOT %fusion.1 = (f32[64]{0:T(256)S(1)}, f32[64,64]{1,0:T(8,128)}) fusion(%copy-done.1, %slice-done.1), kind=kLoop, calls=%fused_computation.1
}
"""
        instrs, sizes = parse_entry(hlo)
        by_name = {i["name"]: i for i in instrs}
        # the tuple-with-layout-parens result parsed (round-2 regex dropped it)
        assert by_name["copy-start.1"]["opcode"] == "copy-start"
        assert by_name["fusion.1"]["opcode"] == "fusion"
        total, per = graph_traffic(instrs, sizes)
        buf = 64 * 64 * 4
        # copy-start: one transfer of the dest's logical bytes
        assert per["copy-start.1"] == buf
        # async slice: one transfer of the payload (element[1]), NOT the
        # full aliased operand tuple
        assert per["slice-start.1"] == 32 * 64 * 4
        # done ops are free
        assert "copy-done.1" not in per and "slice-done.1" not in per
        # the fusion's operands live in VMEM (S(1)) -> only its HBM output
        # element counts; the S(1) stats vector does not
        assert per["fusion.1"] == buf
        assert total == buf + 32 * 64 * 4 + buf

    def test_traffic_on_real_compiled_hlo(self):
        """End to end on an actual compiled program: accounting runs and is
        within sane bounds (>= output bytes, not absurdly larger than the
        cost model's logical bytes)."""
        from scripts.profile_roofline import parse_entry, graph_traffic

        @jax.jit
        def f(a, b):
            return jnp.tanh(a @ b) + a

        a = jnp.ones((256, 256), jnp.float32)
        compiled = f.lower(a, a).compile()
        instrs, sizes = parse_entry(compiled.as_text())
        total, _ = graph_traffic(instrs, sizes)
        assert total >= 256 * 256 * 4  # at least the output
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        logical = float(ca.get("bytes accessed", 0))
        if logical:
            assert total <= logical * 3  # same order of magnitude


class TestXplaneParser:
    def test_parse_cpu_trace(self, tmp_path):
        """jax.profiler on the CPU backend produces an xplane our parser can
        read: at least one plane with named, duration-carrying events."""
        from axcnn.utils.xplane import (parse_xspace, find_xplane_files,
                                        op_totals)

        @jax.jit
        def f(x):
            return (x @ x).sum()

        x = jnp.ones((128, 128), jnp.float32)
        float(f(x))
        with jax.profiler.trace(str(tmp_path)):
            for _ in range(3):
                float(f(x))
        files = find_xplane_files(str(tmp_path))
        assert files, "no xplane.pb written"
        planes = parse_xspace(files[-1])
        assert planes
        n_events = sum(len(ln.events) for p in planes for ln in p.lines)
        assert n_events > 0
        # at least one event with a real duration and a resolved name
        named = [ev for p in planes for ln in p.lines for ev in ln.events
                 if ev.duration_ps > 0 and not ev.name.startswith("#")]
        assert named, "no named events with durations"
        totals = op_totals(planes[0])
        assert isinstance(totals, dict)
