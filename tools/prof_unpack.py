"""Round-3: row-table gather + column-unpack strategies.

The xprof trace of the pt_nee glue shows the (R,16) row-gather's COLUMN
SLICES dominating (2 fused slice kernels x 10.6 ms per bounce at 10 GB/s —
minor-dim slices of a (1M,16) array relayout through padded lane tiles).
Measure alternatives. Honest async-dispatch timing.

Run: python tools/prof_unpack.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20
T = 20884


def timed(name, fn, *args, iters=16):
    jf = jax.jit(fn)
    out = jf(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = jf(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
        best = min(best, time.time() - t0)
    per = best / iters * 1000.0
    print(f"{name:56s} {per:8.2f} ms", flush=True)
    return per


def main():
    print("device:", jax.devices()[0], flush=True)
    k = jax.random.PRNGKey(0)
    tab16 = jax.random.uniform(k, (T, 16), jnp.float32)
    tab16_t = jnp.asarray(np.asarray(tab16).T)  # (16, T)
    tri = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, T, jnp.int32)

    # consumer: sum of 10 columns (forces all columns live, fuses like the
    # integrators' elementwise math)
    def use(cols):
        s = cols[0]
        for c in cols[1:]:
            s = s + c
        return s

    def cur(tri):
        r = jnp.take(tab16, tri, axis=0, mode="clip")
        return use([r[:, i] for i in range(10)])
    timed("CURRENT: gather (R,16) + 10 col slices", cur, tri)

    def tr(tri):
        r = jnp.take(tab16, tri, axis=0, mode="clip").T  # (16, R)
        return use([r[i] for i in range(10)])
    timed("gather (R,16) + transpose + 10 row slices", tr, tri)

    def tgather(tri):
        # gather along axis=1 of the transposed table: (16, R)
        r = jnp.take(tab16_t, tri, axis=1, mode="clip")
        return use([r[i] for i in range(10)])
    timed("gather (16,T) axis=1 -> (16,R) + row slices", tgather, tri)

    def onehot(tri):
        r = jnp.take(tab16, tri, axis=0, mode="clip")  # (R,16)
        eye = jnp.eye(16, dtype=jnp.float32)
        return use([jnp.sum(r * eye[i][None, :], axis=1) for i in range(10)])
    timed("gather (R,16) + one-hot reduce per col", onehot, tri)

    def dotex(tri):
        r = jnp.take(tab16, tri, axis=0, mode="clip")  # (R,16)
        cols = r @ jnp.eye(16, dtype=jnp.float32)[:, :10]  # MXU extract
        return use([cols[:, i] for i in range(10)])
    timed("gather (R,16) + matmul extract (still slices)", dotex, tri)

    def scalar10(tri):
        cols = [jnp.take(tab16_t[i], tri, mode="clip") for i in range(10)]
        return use(cols)
    timed("10 scalar (R,) gathers (the thing rows avoid)", scalar10, tri)

    def resh(tri):
        # gather then bitcast-free reshape to (R*16,) then strided slice
        r = jnp.take(tab16, tri, axis=0, mode="clip").reshape(-1)
        return use([r[i::16] for i in range(10)])
    timed("gather + flat reshape + strided slices", resh, tri)

    # gather cost alone (single fused consumer, no unpack)
    def g_only(tri):
        r = jnp.take(tab16, tri, axis=0, mode="clip")
        return jnp.sum(r, axis=1)
    timed("gather (R,16) + row-sum (no col slices)", g_only, tri)

    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
