"""Probe d_wt formulations for _corner_weighted_sum_bwd (TPU, det shapes).

d_wt[b,h,q,kp,c] = sum_d g[b,h,q,kp,c*D+d] * d_out[b,h,q,d]

Variants:
  slice4   — current: 4 static 32-lane slices of g, each multiply-reduced
             (4 hardware passes over g at 1/4 lane utilization).
  fusedred — g * tile(d_out) -> reshape (..., 4, D) -> sum(-1): one pass
             if XLA fuses the reshape+reduce into the multiply fusion.
  mxu      — batched dot_general (B*H*Q, KP, 4D) x (B*H*Q, 4D, 4) against
             a block-column matrix built from d_out (MXU does the lane-
             group reduction; N=4 pads to 128 but the MXU is idle anyway).

Timing discipline per CLAUDE.md: chain iterations inside ONE jit, feed
varying inputs, end in a device->host value read.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rscotr_tpu.utils import honor_jax_platforms_env
honor_jax_platforms_env()

B, Hn, Q, KP, D = 1, 8, 13294, 16, 32
C4 = 4 * D
ITERS = 8


def dwt_slice4(g, d_out):
    parts = []
    for c in range(4):
        g_c = jax.lax.slice_in_dim(g, c * D, (c + 1) * D, axis=-1)
        parts.append(jnp.sum(
            g_c * d_out[:, :, :, None, :], axis=-1, dtype=jnp.float32))
    return jnp.stack(parts, axis=-1)


def dwt_fusedred(g, d_out):
    dtile = jnp.tile(d_out, (1, 1, 1, 4))[:, :, :, None, :]
    prod = (g * dtile).reshape(B, Hn, Q, KP, 4, D)
    return jnp.sum(prod, axis=-1, dtype=jnp.float32)


def dwt_mxu(g, d_out):
    # M[bhq, c*D+d, c] = d_out[bhq, d]  (block-column matrix from d_out)
    dout_f = d_out.reshape(-1, D)                            # (N, D)
    lane = jnp.arange(4 * D)
    grp = lane // D                                          # (4D,)
    oh = jax.nn.one_hot(grp, 4, dtype=dout_f.dtype)          # (4D, 4)
    mm = dout_f[:, jnp.mod(lane, D)][..., None] * oh[None]   # (N, 4D, 4)
    gf = g.reshape(-1, KP, 4 * D)
    out = jax.lax.dot_general(
        gf, mm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (N, KP, 4)
    return out.reshape(B, Hn, Q, KP, 4)


def chain(fn, g0, d0):
    def body(i, carry):
        acc, g, d = carry
        out = fn(g, d)
        acc = acc + jnp.sum(out)
        # perturb inputs so dispatches can't be cached
        g = g + jnp.bfloat16(1e-3) * jnp.sign(acc).astype(g.dtype)
        d = d + jnp.float32(1e-3)
        return (acc, g, d)
    acc, _, _ = jax.lax.fori_loop(
        0, ITERS, body, (jnp.float32(0.0), g0, d0))
    return acc


def run(name, fn, g0, d0):
    f = jax.jit(functools.partial(chain, fn))
    r = f(g0, d0)
    float(np.asarray(r))  # warmup + value-read sync
    t0 = time.perf_counter()
    r = f(g0 * jnp.bfloat16(1.001), d0 * 1.001)
    v = float(np.asarray(r))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:10s} {dt:7.3f} ms/iter  (val {v:.3e})")
    return dt


def main():
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.normal(size=(B, Hn, Q, KP, C4)).astype(np.float32),
                     dtype=jnp.bfloat16)
    d0 = jnp.asarray(rng.normal(size=(B, Hn, Q, D)).astype(np.float32))
    # correctness cross-check first (small tolerance: same math, diff order)
    a = np.asarray(jax.jit(dwt_slice4)(g0, d0))
    for nm, fn in [("fusedred", dwt_fusedred), ("mxu", dwt_mxu)]:
        b = np.asarray(jax.jit(fn)(g0, d0))
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f"{nm} max rel err vs slice4: {err:.2e}")
        assert err < 2e-2, nm
    for nm, fn in [("slice4", dwt_slice4), ("fusedred", dwt_fusedred),
                   ("mxu", dwt_mxu)]:
        run(nm, fn, g0, d0)


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
