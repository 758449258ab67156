"""Isolate the ~15 ms tail of psd_project_blocks (extraction + clamp) and
A/B the 14-dynamic-slice pack/extract against selector-matmul einsums.

Breakdown so far (probe_psd_breakdown, m=31608): kernel 9.2 ms, pack
1.9 ms, full 25.8 ms -> tail ~14.7 ms.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np


def slope(f, *args, k_lo=2, k_hi=8, reps=3):
    ts = {}
    for k in (k_lo, k_hi):
        float(f(*args, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def main(m="31608"):
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.ops.psd import ns_sign_apply_packed
    from surface_multigrid_code_tpu.ops.well import _x64_kernel_guard

    m = int(m)
    print("device:", jax.devices()[0], "m:", m, flush=True)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, 9, 9)).astype(np.float32)
    H = jnp.asarray(0.5 * (B + B.transpose(0, 2, 1)))
    pack, d = 14, 9
    g = -(-m // pack)
    hi = jax.lax.Precision.HIGHEST
    E = jax.nn.one_hot(
        (np.arange(pack)[:, None] * d + np.arange(d)[None, :]), 128,
        dtype=jnp.float32)

    def head(Hin):
        Hs = 0.5 * (Hin + jnp.swapaxes(Hin, -1, -2))
        sj = jnp.maximum(jnp.abs(Hs).sum(-1).max(-1), 1e-30)
        Xj = Hs / sj[:, None, None]
        Xpad = jnp.zeros((g * pack, d, d), Hin.dtype)
        Xpad = jax.lax.dynamic_update_slice(Xpad, Xj, (0, 0, 0))
        return Hs, sj, Xpad.reshape(g, pack, d, d)

    def pack_slices(X4):
        Z = jnp.zeros((g, 128, 128), X4.dtype)
        for j in range(pack):
            Z = jax.lax.dynamic_update_slice(Z, X4[:, j], (0, j * d, j * d))
        return Z

    def pack_einsum(X4):
        T = jnp.einsum("gjpq,jqc->gjpc", X4, E, precision=hi)
        return jnp.einsum("jpr,gjpc->grc", E, T, precision=hi)

    def extract_slices(Y):
        return jnp.stack(
            [jax.lax.dynamic_slice(Y, (0, j * d, j * d), (g, d, d))
             for j in range(pack)], axis=1,
        ).reshape(g * pack, d, d)[:m]

    def extract_einsum(Y):
        T = jnp.einsum("grc,jqc->gjrq", Y, E, precision=hi)
        return jnp.einsum("jpr,gjrq->gjpq", E, T,
                          precision=hi).reshape(g * pack, d, d)[:m]

    def tail(Hin, Hs, sj, Yb):
        Hp = 0.5 * sj[:, None, None] * Yb
        Hp = 0.5 * (Hp + jnp.swapaxes(Hp, -1, -2))
        clamped = jnp.abs(Hp - Hs).max(axis=(-1, -2)) > 1e-4 * sj
        return jnp.where(clamped[:, None, None], Hp, Hin)

    def make_chain(pack_fn, extract_fn, with_tail):
        @jax.jit
        def chain(H0, k):
            def body(i, h):
                Hs, sj, X4 = head(h)
                with _x64_kernel_guard(h.dtype):
                    Y = ns_sign_apply_packed(pack_fn(X4))
                if extract_fn is None:
                    return h + 0.0 * Y[0, 0, 0]
                Yb = extract_fn(Y).astype(h.dtype)
                if not with_tail:
                    return h + 0.0 * Yb[0, 0, 0]
                return tail(h, Hs, sj, Yb)
            return jnp.sum(jax.lax.fori_loop(0, k, body, H0))
        return chain

    r = {}
    r["head_kernel_ms"] = slope(make_chain(pack_slices, None, False), H)
    print(r, flush=True)
    r["plus_extract_slices_ms"] = slope(
        make_chain(pack_slices, extract_slices, False), H)
    print(r, flush=True)
    r["full_slices_ms"] = slope(
        make_chain(pack_slices, extract_slices, True), H)
    print(r, flush=True)
    r["head_kernel_einsum_ms"] = slope(make_chain(pack_einsum, None, False), H)
    print(r, flush=True)
    r["plus_extract_einsum_ms"] = slope(
        make_chain(pack_einsum, extract_einsum, False), H)
    print(r, flush=True)
    r["full_einsum_ms"] = slope(
        make_chain(pack_einsum, extract_einsum, True), H)
    print(r, flush=True)

    # parity of the einsum pack/extract vs the slice pack/extract
    Hs, sj, X4 = head(H)
    Z1 = pack_slices(X4)
    Z2 = pack_einsum(X4)
    print("pack diff:", float(jnp.abs(Z1 - Z2).max()), flush=True)
    with _x64_kernel_guard(H.dtype):
        Y = ns_sign_apply_packed(Z1)
    b1 = extract_slices(Y)
    b2 = extract_einsum(Y)
    print("extract diff:", float(jnp.abs(b1 - b2).max()), flush=True)
    print("RESULT", r, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
