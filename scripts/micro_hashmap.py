"""Micro: where do activate's 25 ms go? (find probes / claim scatter / mod)"""
import time
from functools import partial

import jax
import jax.numpy as jnp

from open3d_tpu.core import hashmap as hm


def timeit(name, f, *a, n=20):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)
    return out


C, N = 40960, 1024
key = jax.random.PRNGKey(0)
coords = jax.random.randint(key, (N, 3), -100, 100)
keys = hm.pack_coords(coords)
keys = jax.block_until_ready(keys)
table = hm.make_table(C)
table, slot, ok = jax.block_until_ready(jax.jit(hm.activate)(table, keys))

timeit("find(32 probes)", jax.jit(hm.find), table, keys)
timeit("find(8 probes)", jax.jit(partial(hm.find, max_probes=8)), table, keys)
timeit("activate(16 rounds)", jax.jit(hm.activate), table, keys)
timeit("activate(4 rounds)", jax.jit(partial(hm.activate, max_rounds=4)), table, keys)

h = (hm._hash(keys) % jnp.uint32(C)).astype(jnp.int32)
timeit("gather (N,2) x1", jax.jit(lambda t, s: t[s]), table, h)
ids = jnp.arange(N, dtype=jnp.int32)
timeit(
    "scatter-min into C",
    jax.jit(lambda s, i: jnp.full((C,), N + 1, jnp.int32).at[s].min(i)),
    h, ids,
)
timeit("mod C", jax.jit(lambda x: (x.astype(jnp.uint32) % jnp.uint32(C)).astype(jnp.int32)), h)
timeit(
    "scatter-set (N,2) into table",
    jax.jit(lambda t, s, k: t.at[s].set(k)),
    table, h, keys,
)
timeit("unique_keys", jax.jit(partial(hm.unique_keys, capacity=N)), keys)
