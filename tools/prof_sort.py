"""Round-3: sort-chain variants for the packet re-sort (the ~17 ms/trace
argsort chain). Honest async-dispatch timing (see prof_r2c.py docstring).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_sort.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

R = 1 << 20


def timed(name, fn, *args, iters=8):
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
    key = jax.random.randint(k, (R,), 0, 1 << 26, dtype=jnp.int32)
    rows = jax.random.uniform(jax.random.PRNGKey(1), (R, 8))
    iota = jnp.arange(R, dtype=jnp.int32)

    timed("argsort i32 (stable)", lambda x: jnp.argsort(x), key)
    timed("argsort i32 stable=False",
          lambda x: jnp.argsort(x, stable=False), key)
    timed("lax.sort_key_val (k, iota)",
          lambda x: jax.lax.sort_key_val(x, iota)[1], key)
    timed("lax.sort (k,iota) is_stable=False",
          lambda x: jax.lax.sort((x, iota), num_keys=1, is_stable=False)[1],
          key)
    perm = jnp.argsort(key)
    timed("inverse: argsort(perm)", lambda p: jnp.argsort(p), perm)
    timed("inverse: argsort(perm) stable=False",
          lambda p: jnp.argsort(p, stable=False), perm)
    timed("inverse: scatter .at[perm].set(iota)",
          lambda p: jnp.zeros((R,), jnp.int32).at[p].set(iota), perm)
    timed("row gather (R,8) by perm",
          lambda p: jnp.take(rows, p, axis=0), perm)
    timed("row gather (R,4) by perm",
          lambda p: jnp.take(rows[:, :4], p, axis=0), perm)
    # full current chain
    def chain_now(kk, rr):
        p = jnp.argsort(kk)
        a = jnp.take(rr, p, axis=0)
        inv = jnp.argsort(p)
        b = jnp.take(a[:, :2], inv, axis=0)
        return b
    timed("CURRENT chain (2 argsort + 8-row + 2-row gathers)",
          chain_now, key, rows)

    # direct multi-operand sort: carry payload through the sort itself
    def chain_direct(kk, rr):
        cols = [rr[:, i] for i in range(8)]
        out = jax.lax.sort((kk, *cols), num_keys=1, is_stable=False)
        p = None
        return out[1]
    timed("lax.sort with 8 payload operands", chain_direct, key, rows)

    def chain_direct_iota(kk, rr):
        cols = [rr[:, i] for i in range(6)]
        out = jax.lax.sort((kk, iota, *cols), num_keys=1, is_stable=False)
        return out[1]
    timed("lax.sort with iota+6 payload operands", chain_direct_iota,
          key, rows)

    # pack key+idx into one i64-ish trick: (key << 20 | idx) fits 46 bits
    # -> no. But key is 26 bits and idx 20 bits: 46 > 32. Instead sort
    # f64? skip. Try sorting u32 with key in high bits via 2-pass:
    # not applicable. Try: sort (key) carrying idx packed into f32 pairs?
    # Measure plain val sort for the floor:
    timed("sort values only (floor)", lambda x: jnp.sort(x), key)


if __name__ == "__main__":
    main()
