"""Fused isentropic diagnostics (vertical scans), XLA-compiled by default.

Computes p / exner / Montgomery / height (+ rho, T) from the isentropic
density in ONE pass over the grid (reference
``src/tasmania/isentropic/dynamics/diagnostics.py:320-406``).  The column
scans are expressed as *triangular-matrix contractions* on the MXU — for
nz ~ 1e2 a (nz, nz) masked matmul is a few hundred MFLOP, far below the
bandwidth cost of materialising intermediate arrays in HBM.

Implementation note (round-4 measurement, BENCH_NOTES r4_xla_vs_pallas): the
same expression compiled by XLA (0.135 ms) beats the Pallas tiling (0.328 ms)
at the benchmark size — XLA schedules the dot_generals and the surrounding
elementwise chain better than the hand tiling, with bitwise-identical
results.  ``impl="pallas"`` keeps the kernel path selectable.

Exact recurrences (match the reference for allclose validation):
  p[0] = pt;  p[k+1] = p[k] + g·dz·s[k]
  exn = cp·(p/pref)^(rd/cp)
  mtg[nz-1] = θ_s·exn[nz] + g·hs + dz/2·exn[nz];  mtg[k] = mtg[k+1] + dz·exn[k+1]
  h[nz] = hs;  h[k] = h[k+1] - rd·(θ·exn + θ⁺·exn⁺)(p - p⁺)/(cp·g·(p + p⁺))
  rho = s·Δθ/Δh;  T = (θ·exn + θ⁺·exn⁺)/(2·cp)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri(n: int, dtype, lower_incl: bool):
    """(n, n) mask: [l, k] = 1 when l <= k (lower_incl) else when l >= k."""
    l = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((l <= k) if lower_incl else (l >= k)).astype(dtype)


def _scan_matmul(x, m):
    """Contract the last axis of x with the (n, n) scan matrix m (MXU).
    Mosaic wants 2-D dots: collapse the leading dims around the contraction.

    Precision is pinned to HIGHEST (exact f32 on the MXU): Mosaic has no
    lowering for ``Precision.HIGH`` dots, so a softer setting would crash
    the in-kernel Montgomery scans of the fused SI stage — and the r5
    timing probe showed the scans are not a bottleneck anyway
    (BENCH_NOTES r5_negative_results skip_mtg_probe)."""
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    y = jax.lax.dot_general(
        x2,
        m,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(lead + (m.shape[1],))


def _diag_compute(sv, hsv, th, theta_s, *, pt, dz, g, cp, rd, pref, mode):
    """Shared diagnostics math on (..., nz) arrays (hsv (..., 1), th
    (1, 1, nz+1)) — identical expression for the XLA and Pallas paths."""
    nz = sv.shape[-1]
    dtype = sv.dtype
    p_rest = _scan_matmul(g * dz * sv, _tri(nz, dtype, lower_incl=True))
    p = jnp.concatenate([jnp.full_like(sv[..., :1], pt), pt + p_rest], axis=-1)
    exn = cp * (p / pref) ** (rd / cp)

    mtg_s = theta_s * exn[..., nz : nz + 1] + g * hsv
    base = mtg_s + 0.5 * dz * exn[..., nz : nz + 1]
    inc = dz * exn[..., 1:nz]  # exn[k+1], k = 0..nz-2
    rsum = _scan_matmul(inc, _tri(nz - 1, dtype, lower_incl=False))
    mtg = jnp.concatenate([base + rsum, base], axis=-1)

    if mode == "mtg":
        return (mtg,)

    dh = (
        rd
        * (th[..., :-1] * exn[..., :-1] + th[..., 1:] * exn[..., 1:])
        * (p[..., :-1] - p[..., 1:])
        / (cp * g * (p[..., :-1] + p[..., 1:]))
    )
    h_rest = _scan_matmul(dh, _tri(nz, dtype, lower_incl=False))
    h = jnp.concatenate([hsv - h_rest, hsv], axis=-1)

    if mode == "dry":
        return p, exn, mtg, h
    rho = sv * (th[..., :-1] - th[..., 1:]) / (h[..., :-1] - h[..., 1:])
    t = 0.5 / cp * (th[..., :-1] * exn[..., :-1] + th[..., 1:] * exn[..., 1:])
    return p, exn, mtg, h, rho, t


@functools.partial(
    jax.jit,
    static_argnames=(
        "pt", "dz", "g", "cp", "rd", "pref", "mode", "tile_x", "interpret",
        "impl",
    ),
)
def fused_isentropic_diagnostics(
    s,
    hs,
    theta,
    *,
    pt: float,
    dz: float,
    g: float,
    cp: float,
    rd: float,
    pref: float,
    mode: str = "moist",  # "mtg" | "dry" | "moist"
    tile_x: int = 16,
    interpret: bool = False,
    impl: str = "xla",
):
    """Diagnostics from the isentropic density, one fused pass.

    Args:
      s: (nx, ny, nz) isentropic density.
      hs: (nx, ny) topography height.
      theta: (1, nz+1) potential temperature on interface levels.
      impl: "xla" (default, fastest measured) or "pallas".

    Returns:
      mode "mtg":   mtg
      mode "dry":   (p, exn, mtg, h)
      mode "moist": (p, exn, mtg, h, rho, t)
    """
    nx, ny, nz = s.shape
    kw = dict(pt=pt, dz=dz, g=g, cp=cp, rd=rd, pref=pref, mode=mode)

    if impl == "xla":
        outs = _diag_compute(
            s, hs[:, :, None], theta[0][None, None, :], theta[0, nz], **kw
        )
        return outs[0] if mode == "mtg" else tuple(outs)

    TX = min(tile_x, nx)
    NT = pl.cdiv(nx, TX)
    hs3 = hs[:, :, None]  # (nx, ny, 1): lane-friendly broadcast plane

    def kernel(*refs):
        s_ref, hs_ref, th_ref = refs[:3]
        outs = refs[3:]
        res = _diag_compute(
            s_ref[:], hs_ref[:], th_ref[0][None, None, :], th_ref[0, nz], **kw
        )
        for o, r in zip(outs, res):
            o[:] = r

    def spec(lastdim):
        return pl.BlockSpec(
            (TX, ny, lastdim), lambda ix: (ix, 0, 0), memory_space=pltpu.VMEM
        )

    lastdims = {
        "mtg": [nz],
        "dry": [nz + 1, nz + 1, nz, nz + 1],
        "moist": [nz + 1, nz + 1, nz, nz + 1, nz, nz],
    }[mode]
    out_specs = [spec(ld) for ld in lastdims]
    out_shapes = [jax.ShapeDtypeStruct((nx, ny, ld), s.dtype) for ld in lastdims]

    outs = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            spec(nz),
            spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # theta (1, nz+1), whole
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s, hs3, theta)
    return outs[0] if mode == "mtg" else tuple(outs)
