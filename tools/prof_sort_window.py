"""Round-4: the payload sort is now ~half the 20k-tri bounce trace
(prof_stages r4: fwd 10-col sort 11.8 ms + back 3-col sort 7.8 ms of a
39.8 ms trace). Sweep the two levers:

  1. WINDOWED sorts (sort_window knob, ops/packets.py): bitonic cost is
     superlinear in length, tile grouping only needs local coherence.
  2. payload-count scaling: how free are payload operands really?

Honest async-dispatch timing. Run: python tools/prof_sort_window.py
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
    cols = [jax.random.uniform(jax.random.PRNGKey(i), (R,))
            for i in range(16)]
    iota = jnp.arange(R, dtype=jnp.int32)

    # payload scaling, global sort
    for n in (0, 1, 2, 4, 8, 9, 12, 16):
        ops = (key, iota, *cols[:n]) if n else (key,)
        timed(f"global sort, key+iota+{n} payloads",
              lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False), *ops)

    # windowed, 9 payloads (the fwd-sort shape: key iota o3 d3 mask cap)
    for lw in (13, 14, 15, 16, 17, 18):
        W = 1 << lw
        NW = R // W

        def win(*o, NW=NW, W=W):
            out = jax.lax.sort(
                tuple(c.reshape(NW, W) for c in o),
                dimension=1, num_keys=1, is_stable=False)
            return tuple(c.reshape(R) for c in out)

        timed(f"windowed W=2^{lw} sort, key+iota+8 payloads", win,
              key, iota, *cols[:8])

    # back sort (3 cols), global vs windowed
    timed("global back sort (idx,t,tri)",
          lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False),
          iota, cols[0], cols[1])
    for lw in (14, 16, 17):
        W = 1 << lw
        NW = R // W

        def win(*o, NW=NW, W=W):
            out = jax.lax.sort(
                tuple(c.reshape(NW, W) for c in o),
                dimension=1, num_keys=1, is_stable=False)
            return tuple(c.reshape(R) for c in out)

        timed(f"windowed W=2^{lw} back sort (idx,t,tri)", win,
              iota, cols[0], cols[1])


if __name__ == "__main__":
    main()
