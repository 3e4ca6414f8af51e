"""Is (R,) 1-D elementwise math under-utilizing the VPU vs (R/128, 128)?

TPU tiles a 1-D f32 array as (8, 128) vregs with only sublane padding on
the tail — but fusion layouts for long 1-D chains may still differ from
2-D. The integrators carry ALL per-ray state as (R,) columns; if 2-D is
materially faster, a reshape adapter around the integrator glue pays.

Times a ~30-op fused elementwise chain + a threefry-uniform draw on both
shapes. Usage: python tools/prof_1d2d.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20


def timed(name, fn, *args, iters=32):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
        best = min(best, time.time() - t0)
    per = best / iters * 1000.0
    print(f"{name:40s} {per:8.3f} ms", flush=True)
    return per


def chain(x, y, z):
    # ~30 elementwise ops, shading-math-like
    for _ in range(5):
        a = x * y + z
        b = jnp.maximum(a, 0.0) * 0.5
        c = jnp.where(b > 0.1, b, z)
        x = c * a + y
        y = jnp.abs(x - b)
        z = jnp.minimum(y, c)
    return x + y + z


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (R,), jnp.float32)
    y1 = x1 * 1.1
    z1 = x1 * 0.9
    x2, y2, z2 = (v.reshape(R // 128, 128) for v in (x1, y1, z1))
    x3, y3, z3 = (v.reshape(R // 1024, 1024) for v in (x1, y1, z1))

    timed("chain (R,) 1-D", jax.jit(chain), x1, y1, z1)
    timed("chain (R/128, 128)", jax.jit(chain), x2, y2, z2)
    timed("chain (R/1024, 1024)", jax.jit(chain), x3, y3, z3)

    kb = jax.random.split(key, R)          # (R, 2) key batch

    @jax.jit
    def draw1(kb):
        return jax.vmap(lambda k: jax.random.uniform(k, (6,)))(kb)

    timed("uniform_sites-like vmap draw (R,6)", draw1, kb)

    @jax.jit
    def draw2(kb):
        # counter-mode: ONE threefry over (R*6,) from a single fold
        import jax.random as jr
        k = jr.fold_in(key, 7)
        return jr.uniform(k, (6, R))

    timed("single-key bulk draw (6, R)", draw2, kb)

    # row-gather shapes: (T, 16) table rows by (R,) indices
    tab = jax.random.normal(key, (32768, 16), jnp.float32)
    idx = jax.random.randint(key, (R,), 0, 32768)

    @jax.jit
    def g1(tab, idx):
        return jnp.take(tab, idx, axis=0)

    timed("row gather (R, 16)", g1, tab, idx)


if __name__ == "__main__":
    main()
