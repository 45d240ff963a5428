"""Round-4 kernel impl shootout on the real chip (xla vs pallas paths of
the integrated ops + the copy denominator).

The full r4 variant exploration (rolls, g-coefficient hoisting, stacked
scans, per-op probes) lived in ``tasmania_tpu/ops/_tune_variants_r4.py``
during tuning; results are recorded in ``BENCH_NOTES.json r4_xla_vs_pallas``
and the winners are integrated behind the ``impl=`` switch of each op.

Usage: python drivers/tune_r4.py [--nt 100] [--which vadv,sed,diag]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from drivers.driver_roofline import NX, NY, NZ, _mk, time_loop

DT = 5.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=100)
    ap.add_argument("--which", type=str, default="vadv,sed,diag")
    cli = ap.parse_args()
    which = cli.which.split(",")

    dev = jax.devices()[0]
    print(f"tune_r4 on {dev.platform} ({dev.device_kind})")

    big = _mk(99, 16 * NX, NY, NZ)
    copy_ms = time_loop(lambda c: c + 1.0, big, max(cli.nt // 4, 10))
    hbm_gbs = 2 * big.nbytes / (copy_ms * 1e-3) / 1e9
    print(f"practical copy: {hbm_gbs:.1f} GB/s")

    F3 = (NX, NY, NZ)
    s = _mk(2, *F3, lo=5.0, hi=10.0)
    su, sv = _mk(10, *F3), _mk(11, *F3)
    qn = tuple(_mk(4 + i, *F3, lo=0.0, hi=1e-3) for i in range(3))
    w = _mk(23, *F3, lo=-0.01, hi=0.01)
    rho = _mk(21, *F3, lo=0.1, hi=1.2)
    h_if = jnp.sort(_mk(22, NX, NY, NZ + 1, lo=0.0, hi=1.2e4), axis=-1)[..., ::-1]

    def report(name, fn, carry0, nbytes, ref_out=None, new_out=None):
        if ref_out is not None:
            err = max(
                float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref_out, new_out)
            )
        else:
            err = float("nan")
        ms = time_loop(fn, carry0, cli.nt)
        ideal = nbytes / (hbm_gbs * 1e9) * 1e3
        print(
            f"{name:32s} {ms:7.3f} ms  ideal {ideal:6.3f}  "
            f"{100 * ideal / ms:5.1f}%roof  maxabsdiff {err:.2e}"
        )

    if "vadv" in which:
        from tasmania_tpu.ops.vertical_advection_step import (
            fused_vertical_advection_rk3ws as f,
        )

        nbytes = (7 + 6) * s.nbytes
        kw = dict(order=3, dt=DT, dz=1.0)
        op = f(w, s, su, sv, *qn, impl="pallas", **kw)
        ox = f(w, s, su, sv, *qn, impl="xla", **kw)
        report("vadv_pallas(tx8)",
               lambda c: f(w, c, su, sv, *qn, impl="pallas", **kw)[0],
               s, nbytes)
        report("vadv_xla",
               lambda c: f(w, c, su, sv, *qn, impl="xla", **kw)[0],
               s, nbytes, op, ox)

    if "diag" in which:
        from tasmania_tpu.ops.diagnostics_step import (
            fused_isentropic_diagnostics as d,
        )

        hs = _mk(17, NX, NY, lo=0.0, hi=500.0)
        theta = jnp.linspace(400.0, 280.0, NZ + 1, dtype=jnp.float32)[None, :]
        kw = dict(pt=2000.0, dz=1.0, g=9.80665, cp=1004.0, rd=287.05,
                  pref=1.0e5, mode="moist")
        nbytes = s.nbytes + hs.nbytes + 4 * s.size * 4 + 2 * (NX * NY * (NZ + 1)) * 4
        op = d(s, hs, theta, impl="pallas", **kw)
        ox = d(s, hs, theta, impl="xla", **kw)
        report("diag_pallas",
               lambda c: d(c, hs, theta, impl="pallas", **kw)[4], s, nbytes)
        report("diag_xla",
               lambda c: d(c, hs, theta, impl="xla", **kw)[4],
               s, nbytes, op, ox)

    if "sed" in which:
        from tasmania_tpu.ops.sedimentation_step import (
            fused_sedimentation_rk3ws as sd,
        )

        nbytes = 3 * s.nbytes + h_if.nbytes + 2 * s.nbytes
        report("sed_pallas",
               lambda c: sd(rho, h_if, c, order=2, dt=DT)[0], qn[2], nbytes)


if __name__ == "__main__":
    main()
