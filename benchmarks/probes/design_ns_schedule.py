"""Design an accelerated Newton-Schulz sign schedule for psd_project_blocks.

Pure numpy, no JAX.  The NS iteration is a matrix function of its input, so
its action on eigenvalues is exactly the scalar iteration x <- p(x); we can
therefore design and validate coefficient schedules on a scalar grid.

Current production schedule: 16 x cubic NS (1.5 x - 0.5 x^3) on X = H/s with
s = per-block inf-norm (a >= lam_max upper bound).  Cost = 32 matmuls of the
packed 126x126 block diag.  Goal: match or beat its saturation threshold
(|p^k(r) - 1| small for r >= r*) with far fewer matmuls, keeping EXACT f32
matmul math (no bf16), sign-preservation p >= 0 on the whole domain, and
stability for |x| up to u0 > 1 (headroom for a power-iteration scale that
may sit below the true lam_max).

Output: the chosen schedule, printed as python literals + its validation.
"""

import numpy as np


def run_schedule(x, coeffs):
    for a, b in coeffs:
        x = a * x - b * x ** 3
    return x


def saturation(coeffs, grid):
    return np.abs(run_schedule(grid, coeffs) - 1.0)


def main():
    grid = np.geomspace(1e-5, 1.0, 20000)

    base = [(1.5, 0.5)] * 16
    err16 = saturation(base, grid)
    # threshold where 16-iter NS reaches |err| <= tol
    for tol in (1e-2, 1e-3, 1e-4):
        r_star = grid[np.argmax(err16 <= tol)]
        print(f"baseline 16x cubic: err<={tol:g} for r >= {r_star:.3e}")

    # Greedy design: cubic steps a*x - b*x^3, p(1)!=1 allowed mid-schedule.
    # State: interval [l, u] that provably contains every |eigenvalue| of the
    # iterate.  Each step picks `a` as large as possible subject to:
    #   - p >= 0 on [0, u]  (no sign flips):      u^2 <= a/b
    #   - new u' = max p on [0, u] <= U_CAP       (stay in basin)
    # and b is chosen so the max of p on [0,u] equals exactly U_CAP (inflate
    # small values at max rate while pinning the top).  Terminate the greedy
    # phase once l >= L_STOP, then append plain cubic NS cleanup iterations.
    U_CAP = 1.20
    L_STOP = 0.55
    R_TARGET = 1.5e-3   # design saturation point (|lam|/s after scaling)
    U0 = 1.40           # stability domain upper bound (power-iter headroom)

    def step_bounds(l, u, a, b):
        xs = np.array([l, u])
        xstar = np.sqrt(a / (3 * b)) if b > 0 else None
        cand = [a * x - b * x ** 3 for x in xs]
        if xstar is not None and l <= xstar <= u:
            cand.append(a * xstar - b * xstar ** 3)
        lo = min(a * l - b * l ** 3, a * u - b * u ** 3)
        hi = max(cand)
        return lo, hi

    l, u = R_TARGET, U0
    sched = []
    for it in range(30):
        if l >= L_STOP:
            break
        # p max on [0,u] is at xstar if xstar<=u else at u.
        # choose a maximal subject to max p = U_CAP and p>=0 on [0,u].
        best = None
        for a in np.linspace(1.2, 8.0, 3000):
            # pick b so max_{[0,u]} p = U_CAP
            # try interior max: p(xstar) = (2a/3) * sqrt(a/(3b)) = U_CAP
            #   -> sqrt(a/(3b)) = 1.5*U_CAP/a -> b = a^3/(3*(1.5*U_CAP)^2)... solve:
            # p(xstar) = a*xstar - b*xstar^3 with xstar=sqrt(a/(3b)):
            #  = (2/3)*a*xstar -> xstar = 1.5*U_CAP/a, b = a/(3*xstar^2)
            xstar = 1.5 * U_CAP / a
            if xstar <= u:
                b = a / (3 * xstar ** 2)
            else:
                # max at u: a*u - b*u^3 = U_CAP
                b = (a * u - U_CAP) / u ** 3
                if b < 0:
                    b = 0.0
            # sign preservation on [0,u]
            if b > 0 and u ** 2 > a / b:
                continue
            lo, hi = step_bounds(l, u, a, b)
            if hi > U_CAP + 1e-9 or lo <= 0:
                continue
            if best is None or lo > best[0]:
                best = (lo, hi, a, b)
        lo, hi, a, b = best
        sched.append((a, b))
        l, u = lo, hi
        print(f"greedy step {it}: a={a:.4f} b={b:.4f} -> [l,u]=[{l:.4f},{u:.4f}]")

    # cleanup cubic NS until err small on [l, u]
    cleanup = 0
    g2 = np.geomspace(R_TARGET, U0, 20000)
    while True:
        err = saturation(sched + [(1.5, 0.5)] * cleanup, g2)
        if err.max() <= 5e-9 or cleanup > 10:
            break
        cleanup += 1
    sched_full = sched + [(1.5, 0.5)] * cleanup
    print(f"\nschedule: {len(sched)} greedy + {cleanup} cleanup = "
          f"{len(sched_full)} cubics ({2 * len(sched_full)} matmuls vs 32)")
    print("coeffs =", [(round(a, 6), round(b, 6)) for a, b in sched_full])

    # Validation vs baseline on the full grid
    errN = saturation(sched_full, grid)
    for tol in (1e-2, 1e-3, 1e-4):
        r_new = grid[np.argmax(errN <= tol)]
        r_old = grid[np.argmax(err16 <= tol)]
        print(f"err<={tol:g}: new r*={r_new:.3e}  old r*={r_old:.3e}")
    # stability / sign preservation on [0, U0]
    g3 = np.linspace(0, U0, 200001)
    out = run_schedule(g3, sched_full)
    print(f"range on [0,{U0}]: min={out.min():.3e} max={out.max():.6f} "
          f"(must be >=0 and <= ~1.2)")
    # monotone error decay for sub-threshold values: |out| <= amplified |x|
    small = g3[(g3 > 0) & (g3 < R_TARGET)]
    amp = np.abs(run_schedule(small, sched_full)) / small
    print(f"sub-threshold amplification |S(x)|/x: max={amp.max():.2f} "
          f"(residue on unclamped eigenvalue <= amp*|lam|... must be finite; "
          f"clamp correction for tiny lam stays O(lam))")

    # What does the correction look like? PSD(H) err vs exact clamp:
    # exact: lam -> max(lam,0); ours: lam -> lam*(1+S(lam/s))/2 * ... on
    # scaled value.  For tiny |lam| with S~amp*lam/s, correction offset
    # ~ lam/2*(1 - amp*lam/s) ~ lam/2: same as the old schedule's behavior.
    print("\nDone.")


if __name__ == "__main__":
    main()
