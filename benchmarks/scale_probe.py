import time, logging
logging.getLogger("proxmin").setLevel(logging.ERROR)
import numpy as np, jax, jax.numpy as jnp
import proxmin_tpu as pt

C, K, N = 5, 7, 20_000_000
Y = jax.random.uniform(jax.random.PRNGKey(0), (C, N), jnp.float32)
A = jax.random.uniform(jax.random.PRNGKey(1), (C, K), jnp.float32)
S = jax.random.uniform(jax.random.PRNGKey(2), (K, N), jnp.float32)
W = 0.5 + jax.random.uniform(jax.random.PRNGKey(3), (C, N), jnp.float32)
jax.block_until_ready((Y, A, S, W))

for label, kw in [
    ("adaprox 20M", dict(algorithm="adaprox", max_iter=3)),
    ("bsdmm 20M", dict(algorithm="bsdmm", max_iter=2)),
    ("weighted pgm stride 20M", dict(W=W, max_iter=3, step_stride=2)),
]:
    t0 = time.time()
    res = pt.nmf.nmf(Y, A, S, e_rel=0, **kw)
    ok = bool(np.isfinite(np.asarray(res.x[0])).all())
    print(f"{label}: ok={ok} {time.time()-t0:.1f}s", flush=True)
