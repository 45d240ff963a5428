"""Per-kernel HBM roofline report at the flagship benchmark size.

BASELINE.md's north star is "grid-points/s/chip at HBM roofline per stencil";
this driver measures each registered Pallas kernel's achieved bandwidth and
reports it as a fraction of the practical copy bandwidth measured on THIS
chip in the same harness (so the roofline is apples-to-apples: same in-jit
fori_loop, same fetch-probe completion; BENCH_NOTES.json methodology).

Bytes counted = unique input arrays + outputs (the fusion ideal: each operand
crosses HBM exactly once; halo re-reads are kernel overhead, not useful
traffic).  ``--write`` records the table into BENCH_NOTES.json under
``kernel_roofline``.

Usage: python drivers/driver_roofline.py [--nt 200] [--write]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

NX = NY = 161
NZ = 120
NB = 3
DT = 5.0
DX = DY = 2200.0


def _mk(key, *shape, lo=0.5, hi=1.5):
    return jax.random.uniform(
        jax.random.PRNGKey(key), shape, jnp.float32, lo, hi
    )


def time_loop(make_step, carry0, nt):
    """ms/call of ``carry = make_step(carry)`` under one in-jit fori_loop.

    Slope-based: time the loop at nt and 2*nt and divide the DIFFERENCE by
    nt — the fixed per-dispatch cost of the axon tunnel (~20 ms RPC round
    trip) cancels exactly instead of inflating cheap kernels (it dominated
    the copy case at nt=200: 28 ms total of which most was overhead,
    reading as a 175 GB/s "roofline" with kernels at 200% of it)."""

    def loop(c0, n):
        return jax.lax.fori_loop(0, n, lambda i, c: make_step(c), c0)

    loop_c = jax.jit(loop, static_argnums=(1,))
    probe = jax.jit(lambda x: jnp.sum(x))

    def run(n):
        t0 = time.perf_counter()
        float(probe(loop_c(carry0, n)))
        return time.perf_counter() - t0

    run(nt)  # warm up both programs (the n=2nt loop shares the trace cache
    run(2 * nt)  # only if jit re-specializes; warm each explicitly)
    t1 = min(run(nt), run(nt))
    t2 = min(run(2 * nt), run(2 * nt))
    return max(t2 - t1, 1e-9) / nt * 1e3


def _bytes(*arrays):
    seen, total = set(), 0
    for a in arrays:
        if id(a) not in seen:
            seen.add(id(a))
            total += a.size * a.dtype.itemsize
    return total


def build_cases():
    """name -> (make_step(carry)->carry, carry0, unique_bytes).

    The carry is one (nx, ny, nz) field threaded through the kernel to chain
    loop iterations; all other operands are loop-invariant (XLA hoists their
    HBM residency, matching how the real model streams a working set)."""
    from tasmania_tpu.ops.advection_step import (
        fused_advection_fields,
        fused_momentum_epilogue,
    )
    from tasmania_tpu.ops.diagnostics_step import fused_isentropic_diagnostics
    from tasmania_tpu.ops.kessler_step import fused_kessler_rk2, fused_satadj_rk2
    from tasmania_tpu.ops.sedimentation_step import fused_sedimentation_rk3ws
    from tasmania_tpu.ops.smagorinsky_step import fused_smagorinsky_rk2
    from tasmania_tpu.ops.smoothing_step import fused_smoothing
    from tasmania_tpu.ops.vertical_advection_step import (
        fused_vertical_advection_rk3ws,
    )

    F3 = (NX, NY, NZ)
    u = _mk(0, NX + 1, NY, NZ)
    v = _mk(1, NX, NY + 1, NZ)
    s = _mk(2, *F3, lo=5.0, hi=10.0)
    si = _mk(3, *F3, lo=5.0, hi=10.0)
    qn = tuple(_mk(4 + i, *F3, lo=0.0, hi=1e-3) for i in range(3))
    qi = tuple(_mk(7 + i, *F3, lo=0.0, hi=1e-3) for i in range(3))
    su, sv = _mk(10, *F3), _mk(11, *F3)
    sui, svi = _mk(12, *F3), _mk(13, *F3)
    mtg, mtg2 = _mk(14, *F3, lo=1e5, hi=3e5), _mk(15, *F3, lo=1e5, hi=3e5)
    gamma = jnp.zeros((NX, NY), jnp.float32).at[:NB].set(0.5).at[-NB:].set(0.5)
    rmat = _mk(16, 1, NZ, lo=0.0, hi=0.1)
    hs = _mk(17, NX, NY, lo=0.0, hi=500.0)
    theta = jnp.linspace(400.0, 280.0, NZ + 1, dtype=jnp.float32)[None, :]
    t_air = _mk(18, *F3, lo=230.0, hi=300.0)
    p_if = _mk(19, NX, NY, NZ + 1, lo=2e4, hi=1e5)
    exn_if = _mk(20, NX, NY, NZ + 1, lo=700.0, hi=1004.0)
    rho = _mk(21, *F3, lo=0.1, hi=1.2)
    h_if = jnp.sort(_mk(22, NX, NY, NZ + 1, lo=0.0, hi=1.2e4), axis=-1)[
        ..., ::-1
    ]
    w = _mk(23, *F3, lo=-0.01, hi=0.01)
    gsm = _mk(24, 6, NZ, lo=0.0, hi=0.5)

    cases = {}

    def adv(c):
        outs = fused_advection_fields(
            u, v, (c,) + qn, (si,) + qi, None, gamma, c,
            order=5, nb=NB, dt=DT, dx=DX, dy=DY,
            q_product=(False, True, True, True),
        )
        return outs[0]

    cases["advection_fields(4f,q_product,bc)"] = (
        adv, s, _bytes(u, v, s, si, *qn, *qi, s) + 4 * s.nbytes
    )

    def epi(c):
        outs = fused_momentum_epilogue(
            u, v, su, sv, sui, svi, c, mtg, si, mtg2,
            qn, gamma, c, su, sv, qi, rmat,
            order=5, nb=NB, dt=DT, dtf=DT, dx=DX, dy=DY, eps=0.5,
            nq=3, do_damp=True,
        )
        return outs[0]

    cases["momentum_epilogue(6f out)"] = (
        epi, s,
        _bytes(u, v, su, sv, sui, svi, s, mtg, si, mtg2, *qn, *qi)
        + 6 * s.nbytes,
    )

    def diag(c):
        outs = fused_isentropic_diagnostics(
            c, hs, theta,
            pt=2000.0, dz=1.0, g=9.80665, cp=1004.0, rd=287.05,
            pref=1.0e5, mode="moist",
        )
        return outs[4]  # rho, (nx, ny, nz)

    diag_out_bytes = 4 * s.size * 4 + 2 * (NX * NY * (NZ + 1)) * 4
    cases["diagnostics(moist,MXU scans)"] = (
        diag, s, _bytes(s, hs) + diag_out_bytes
    )

    def si_stage(c):
        from tasmania_tpu.ops.si_stage import fused_si_stage

        outs = fused_si_stage(
            u, v, c, si, qn, qi, su, sv, sui, svi, mtg, hs, theta, gamma,
            si, su, sv, qn, rmat,
            order=5, nb=NB, nr=6, dt=DT, dtf=DT, dx=DX, dy=DY, eps=0.5,
            pt=2000.0, dz=1.0, g=9.80665, cp=1004.0, rd=287.05, pref=1.0e5,
            nq=3, do_damp=True, dd=15,
        )
        return outs[0]

    # whole stage: u, v, s_now(c), s_int, 3 q_now, 3 q_int, su/sv now+int,
    # mtg_now in; band/slab refs ~0.2 sweeps; 6 outs
    cases["si_stage(whole stage, 6f out)"] = (
        si_stage, s,
        _bytes(u, v, s, si, *qn, *qi, su, sv, sui, svi, mtg)
        + int(0.2 * s.nbytes) + 6 * s.nbytes,
    )

    def mtg_only(c):
        return fused_isentropic_diagnostics(
            c, hs, theta,
            pt=2000.0, dz=1.0, g=9.80665, cp=1004.0, rd=287.05,
            pref=1.0e5, mode="mtg",
        )

    # runs 3x/step (one per SI stage): s in, mtg out
    cases["montgomery(per-stage scan)"] = (
        mtg_only, s, _bytes(s, hs) + s.nbytes
    )

    def vadv(c):
        outs = fused_vertical_advection_rk3ws(
            w, c, su, sv, qn[0], qn[1], qn[2], order=3, dt=DT, dz=1.0
        )
        return outs[0]

    cases["vertical_advection_rk3ws(6f)"] = (
        vadv, s, _bytes(w, s, su, sv, *qn) + 6 * s.nbytes
    )

    def smoo(c):
        outs = fused_smoothing((c, su, sv, *qn), gsm, order=2, nb=NB)
        return outs[0]

    cases["smoothing(6f,order2)"] = (
        smoo, s, _bytes(s, su, sv, *qn) + 6 * s.nbytes
    )

    def sed(c):
        q_out, vt = fused_sedimentation_rk3ws(rho, h_if, c, order=2, dt=DT)
        return q_out

    cases["sedimentation_rk3ws"] = (
        sed, qn[2], _bytes(rho, h_if, qn[2]) + 2 * s.nbytes
    )

    def smag(c):
        osu, osv = fused_smagorinsky_rk2(
            c, su, sv, dx=DX, dy=DY, cs=0.18, nb=NB, dt=DT
        )
        return osu

    # two stages, each re-reads (s, su_st, sv_st, su, sv) and writes 2: the
    # unfused-stage traffic is the honest denominator for this wrapper
    cases["smagorinsky_rk2(2 stages)"] = (
        smag, s, 2 * (5 * s.nbytes + 2 * s.nbytes)
    )

    def kes(c):
        outs = fused_kessler_rk2(
            rho, t_air, p_if, exn_if, c, qn[1], qn[2],
            a=5e-4, k1=1e-3, k2=2.2, beta=0.622, lhvw=2.5e6, dt=DT,
        )
        return outs[0]

    cases["kessler_rk2"] = (
        kes, qn[0],
        _bytes(rho, t_air, p_if, exn_if, *qn) + 4 * s.nbytes,
    )

    def sat(c):
        outs = fused_satadj_rk2(
            t_air, p_if, exn_if, c, qn[1], w,
            sr=0.5, beta=0.622, lhvw=2.5e6, cp=1004.0, rv=461.5, dt=DT,
        )
        return outs[0]

    cases["satadj_rk2"] = (
        sat, qn[0], _bytes(t_air, p_if, exn_if, qn[0], qn[1], w) + 3 * s.nbytes
    )

    return cases, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=200)
    ap.add_argument("--write", action="store_true",
                    help="record the table into BENCH_NOTES.json")
    cli = ap.parse_args()

    dev = jax.devices()[0]
    print(f"roofline on {dev.platform} ({dev.device_kind}), "
          f"{NX}x{NY}x{NZ} f32, nt={cli.nt}")

    cases, s = build_cases()

    # the roofline: practical copy bandwidth in the SAME harness.  The copy
    # carry must NOT fit in VMEM (v5e: 128 MB), or XLA keeps it resident
    # across the fori_loop and the "copy" never touches HBM (measured
    # 1547 GB/s — above the chip's 819 GB/s spec — with a 12 MB carry);
    # stream ~200 MB so the loop is honestly HBM-bound.
    # MEDIAN of >= 5 measurements with the spread reported: the single-shot
    # denominator swung 484-580 GB/s run-to-run on this shared chip and put
    # two committed documents 15 points apart (VERDICT r3 weak #1).
    big = _mk(99, 16 * NX, NY, NZ)
    samples = sorted(
        2 * big.nbytes
        / (time_loop(lambda c: c + 1.0, big, max(cli.nt // 4, 10)) * 1e-3)
        / 1e9
        for _ in range(5)
    )
    hbm_gbs = samples[len(samples) // 2]
    print(f"practical HBM copy bandwidth: median {hbm_gbs:6.1f} GB/s "
          f"of {len(samples)} runs, spread [{samples[0]:.1f}, {samples[-1]:.1f}] "
          f"(r+w of {big.nbytes/1e6:.0f} MB)\n")
    print(f"{'kernel':40s} {'ms':>8s} {'GB/s':>7s} {'ideal':>7s} {'%roof':>6s}")

    rows = {}
    for name, (fn, carry0, nbytes) in cases.items():
        ms = time_loop(fn, carry0, cli.nt)
        gbs = nbytes / (ms * 1e-3) / 1e9
        ideal_ms = nbytes / (hbm_gbs * 1e9) * 1e3
        pct = 100.0 * ideal_ms / ms
        rows[name] = {
            "ms": round(ms, 3),
            "gbs": round(gbs, 1),
            "ideal_ms": round(ideal_ms, 3),
            "pct_roofline": round(pct, 1),
        }
        print(f"{name:40s} {ms:8.3f} {gbs:7.1f} {ideal_ms:7.3f} {pct:6.1f}")

    worst = min(rows.items(), key=lambda kv: kv[1]["pct_roofline"])
    print(f"\nnext-worst kernel: {worst[0]} at {worst[1]['pct_roofline']}% "
          f"of roofline")

    if cli.write:
        notes_path = Path(__file__).resolve().parent.parent / "BENCH_NOTES.json"
        notes = json.loads(notes_path.read_text())
        notes["kernel_roofline"] = {
            "chip": f"{dev.platform} ({dev.device_kind})",
            "practical_copy_gbs": round(hbm_gbs, 1),
            "copy_gbs_spread": [round(samples[0], 1), round(samples[-1], 1)],
            "denominator_note": "median of 5 slope-timed ~200 MB streaming "
            "copies in this same harness; this table is THE single source "
            "all documents must cite (VERDICT r3 weak #1)",
            "bytes_counted": "unique inputs + outputs (fusion ideal)",
            "kernels": rows,
            "next_worst": worst[0],
        }
        notes_path.write_text(json.dumps(notes, indent=1) + "\n")
        print(f"wrote kernel_roofline to {notes_path}")


if __name__ == "__main__":
    main()
