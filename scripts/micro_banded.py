"""Microbenchmark the banded 1-NN pieces at the ICP bench shape."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/o3dtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from open3d_tpu.core import nns

rng = np.random.default_rng(0)
M = N = 40960
# room-scale scene, ~25k valid
tgt = jnp.asarray(rng.uniform(-1.5, 1.5, (M, 3)).astype(np.float32))
tmask = jnp.asarray(rng.uniform(size=M) > 0.35)
q = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
extras = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
dmax = 0.05


def drain(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def timeit(f, args, reps=30):
    out = f(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    drain(out)
    return (time.perf_counter() - t0) / reps


for W in (2048, 4096):
    b = nns.banded_build(tgt, tmask, extras, window=W)
    qs = q[jnp.argsort(nns.banded_query_key(b, q))]
    for Q in (256, 512, 1024, 2048):
        f = jax.jit(lambda qq, b=b, Q=Q: nns.banded_one_nn(b, qq, dmax, tile=Q))
        t = timeit(f, (qs,))
        idx, d2, sel, short = f(qs)
        print(
            f"W={W:5d} Q={Q:5d}: {t*1e3:7.3f} ms  shortfall={int(short)} "
            f"valid={int(jnp.sum(idx >= 0))}"
        )
