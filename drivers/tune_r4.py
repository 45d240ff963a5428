"""Round-4 kernel variant shootout on the real chip.

Usage: python drivers/tune_r4.py [--nt 200] [--which vadv,sed,diag]
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
import numpy as np

from drivers.driver_roofline import NX, NY, NZ, _mk, time_loop

DT = 5.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=200)
    ap.add_argument("--which", type=str, default="vadv,sed")
    ap.add_argument("--tx", type=int, default=16)
    cli = ap.parse_args()
    which = cli.which.split(",")

    dev = jax.devices()[0]
    print(f"tune_r4 on {dev.platform} ({dev.device_kind}), tx={cli.tx}")

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
            errs = [
                float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref_out, new_out)
            ]
            err = max(errs)
        else:
            err = float("nan")
        ms = time_loop(fn, carry0, cli.nt)
        ideal = nbytes / (hbm_gbs * 1e9) * 1e3
        print(
            f"{name:32s} {ms:7.3f} ms  ideal {ideal:6.3f}  "
            f"{100 * ideal / ms:5.1f}%roof  maxabsdiff_vs_v1 {err:.2e}"
        )
        return ms

    if "vadv" in which:
        from tasmania_tpu.ops.vertical_advection_step import (
            fused_vertical_advection_rk3ws as v1,
        )
        from tasmania_tpu.ops._tune_variants_r4 import vadv_rk3ws_v2 as v2

        from tasmania_tpu.ops._tune_variants_r4 import (
            vadv_rk3ws_jnp as vj,
            vadv_rk3ws_v3 as v3,
        )

        nbytes = (7 + 6) * s.nbytes
        kw = dict(order=3, dt=DT, dz=1.0)
        o1 = v1(w, s, su, sv, *qn, tile_x=16, **kw)
        report(
            "vadv_v1_tx16",
            lambda c: v1(w, c, su, sv, *qn, tile_x=16, **kw)[0],
            s, nbytes,
        )

        from tasmania_tpu.ops._tune_variants_r4 import (
            vadv_rk3ws_jnp_exact as vje,
        )

        oje = vje(w, s, su, sv, *qn, **kw)
        report(
            "vadv_jnp_exact(XLA)",
            lambda c: vje(w, c, su, sv, *qn, **kw)[0],
            s, nbytes, o1, oje,
        )

    if "diag" in which:
        from tasmania_tpu.ops.diagnostics_step import (
            fused_isentropic_diagnostics as d1,
        )
        from tasmania_tpu.ops._tune_variants_r4 import diag_v2 as d2

        hs = _mk(17, NX, NY, lo=0.0, hi=500.0)
        theta = jnp.linspace(400.0, 280.0, NZ + 1, dtype=jnp.float32)[None, :]
        kw = dict(
            pt=2000.0, dz=1.0, g=9.80665, cp=1004.0, rd=287.05,
            pref=1.0e5, mode="moist", tile_x=cli.tx,
        )
        nbytes = s.nbytes + hs.nbytes + 4 * s.size * 4 + 2 * (NX * NY * (NZ + 1)) * 4
        from tasmania_tpu.ops._tune_variants_r4 import diag_jnp as dj

        o1 = d1(s, hs, theta, **kw)
        o2 = d2(s, hs, theta, **kw)
        kwj = {k: v for k, v in kw.items() if k != "tile_x"}
        oj = dj(s, hs, theta, **kwj)
        report("diag_v1", lambda c: d1(c, hs, theta, **kw)[4], s, nbytes)
        report(
            "diag_jnp(XLA)",
            lambda c: dj(c, hs, theta, **kwj)[4],
            s, nbytes, o1, oj,
        )
        report(
            "diag_v2(stacked)",
            lambda c: d2(c, hs, theta, **kw)[4],
            s, nbytes, o1, o2,
        )
        report(
            "diag_v2(no matmul)",
            lambda c: d2(c, hs, theta, skip_mm=True, **kw)[4],
            s, nbytes,
        )
        report(
            "diag_v2(no pow)",
            lambda c: d2(c, hs, theta, skip_pow=True, **kw)[4],
            s, nbytes,
        )

    if "sed" in which:
        from tasmania_tpu.ops.sedimentation_step import (
            fused_sedimentation_rk3ws as s1,
        )
        from tasmania_tpu.ops._tune_variants_r4 import sed_rk3ws_v2 as s2

        nbytes = 3 * s.nbytes + h_if.nbytes + 2 * s.nbytes
        kw = dict(order=2, dt=DT, tile_x=cli.tx)
        from tasmania_tpu.ops._tune_variants_r4 import sed_rk3ws_jnp as sj

        o1 = s1(rho, h_if, qn[2], **kw)
        kwj = dict(order=2, dt=DT)
        oj = sj(rho, h_if, qn[2], **kwj)
        report("sed_v1", lambda c: s1(rho, h_if, c, **kw)[0], qn[2], nbytes)
        report(
            "sed_jnp(XLA)",
            lambda c: sj(rho, h_if, c, **kwj)[0],
            qn[2], nbytes, o1, oj,
        )


if __name__ == "__main__":
    main()
