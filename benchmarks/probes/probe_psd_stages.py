"""Stage-isolate the Mosaic-compiled NS sign kernel wrongness (round 4).

probe_psd_kernel.py showed the fused kernel compiles+runs on TPU but the
output is not projected (CPU interpret passes).  Stages:
  1 identity copy        (BlockSpec / multi-tile indexing)
  2 single matmul        (in-kernel jnp.dot lowering)
  3 one plain NS cubic   (chained matmuls)
  4 full plain schedule  (12x (1.5,0.5))
  5 accelerated schedule (ops/psd.NS_SCHEDULE)
Each kernel output is compared to the same math via eager XLA einsums.
"""
import sys
sys.path.insert(0, ".")
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from surface_multigrid_code_tpu.ops.psd import (
        NS_SCHEDULE, ns_sign_apply_packed_xla, _TILE, _T)

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    g = 8
    # packed block-diag-like input: symmetric, spectral radius <= ~1
    B = rng.standard_normal((g, _TILE, _TILE)).astype(np.float32)
    B = 0.5 * (B + B.transpose(0, 2, 1))
    s = np.abs(B).sum(-1).max(-1)
    X = jnp.asarray(B / s[:, None, None])

    def run(kernel, x):
        return pl.pallas_call(
            kernel,
            grid=(g // _T,),
            in_specs=[pl.BlockSpec((_T, _TILE, _TILE), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((_T, _TILE, _TILE), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, _TILE, _TILE), jnp.float32),
        )(x)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def k_ident(x_ref, y_ref):
        for t in range(_T):
            y_ref[t] = x_ref[t]

    def k_mm(x_ref, y_ref):
        for t in range(_T):
            y_ref[t] = dot(x_ref[t], x_ref[t])

    def k_sched(x_ref, y_ref, *, schedule):
        x0 = [x_ref[t] for t in range(_T)]
        z = list(x0)
        for a, b in schedule:
            z2 = [dot(zt, zt) for zt in z]
            z = [a * zt - b * dot(z2t, zt) for zt, z2t in zip(z, z2)]
        for t in range(_T):
            y_ref[t] = x0[t] + dot(x0[t], z[t])

    def oracle(x, schedule):
        return np.asarray(ns_sign_apply_packed_xla(x, schedule))

    def cmp(name, got, want):
        got, want = np.asarray(got), np.asarray(want)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
        print(f"stage {name}: max_rel={rel:.3e}  got_absmax={np.abs(got).max():.3e}  want_absmax={np.abs(want).max():.3e}", flush=True)
        return rel

    cmp("1-ident", run(k_ident, X), X)
    cmp("2-matmul", run(k_mm, X), jnp.einsum("fij,fjk->fik", X, X))
    one = ((1.5, 0.5),)
    cmp("3-one-ns", run(partial(k_sched, schedule=one), X), oracle(X, one))
    plain = tuple((1.5, 0.5) for _ in range(12))
    cmp("4-plain-12", run(partial(k_sched, schedule=plain), X),
        oracle(X, plain))
    cmp("5-accel", run(partial(k_sched, schedule=NS_SCHEDULE), X),
        oracle(X, NS_SCHEDULE))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
