import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

def timed(fn, *args, n=5):
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)
base = timed(jax.jit(lambda x: x + 1), jnp.zeros(8))
print(f"baseline: {base*1e3:.2f} ms", flush=True)

NO, C = 700_000, 64
cache = jax.jit(lambda k: jax.random.normal(k, (NO, C, 48), jnp.float32))(jax.random.PRNGKey(0))
jax.block_until_ready(cache)
for M2 in (131_072, 65_536):
    qidx = jnp.asarray(rng.integers(0, NO, M2, dtype=np.int32))
    def knn_cache(cache, qidx):
        rows = cache[qidx]
        d2 = jnp.sum(rows[..., :3]**2, -1)
        _, top = jax.lax.top_k(-d2, 8)
        sel = jnp.take_along_axis(rows, top[..., None], axis=1)
        return sel.sum()
    t = timed(jax.jit(knn_cache), cache, qidx) - base
    print(f"cache KNN [{M2} x {C} x 48]: {t*1e3:.2f} ms", flush=True)

src = jnp.asarray(rng.standard_normal(131_072).astype(np.float32))
tix = jnp.asarray(rng.permutation(655_360)[:131_072].astype(np.int32))
f = jax.jit(lambda s, i: jnp.zeros(655_360, jnp.float32).at[i].set(s).sum())
print(f"scatter 131k->655k: {(timed(f, src, tix)-base)*1e3:.2f} ms", flush=True)

M, NV = 3_276_800, 2_000_000
occ = jnp.asarray(rng.integers(0, 2, NV, dtype=np.int32))
idx_rand = jnp.asarray(rng.integers(0, NV, M, dtype=np.int32))
idx_sort = jnp.sort(idx_rand)
f = jax.jit(lambda t_, i: t_[i].sum())
print(f"gather rand:   {(timed(f, occ, idx_rand)-base)*1e3:.2f} ms", flush=True)
print(f"gather sorted: {(timed(f, occ, idx_sort)-base)*1e3:.2f} ms", flush=True)

# attribute gather at training scale
payload = jax.jit(lambda k: jax.random.normal(k, (NO, 44), jnp.float32))(jax.random.PRNGKey(2))
for G in (1_048_576, 345_000):
    gi = jnp.asarray(rng.integers(0, NO, G, dtype=np.int32))
    f = jax.jit(lambda t_, i: t_[i].sum())
    print(f"attr gather [{G} x 44]: {(timed(f, payload, gi)-base)*1e3:.2f} ms", flush=True)

k2 = jax.random.PRNGKey(1)
a = jax.jit(lambda k: jax.random.normal(k, (131_072*8, 284), jnp.float32).astype(jnp.bfloat16))(k2)
w1 = jnp.asarray(rng.standard_normal((284, 256)).astype(np.float32)).astype(jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32)).astype(jnp.bfloat16)
def tower(a, w1, w2):
    x = jax.nn.leaky_relu(a @ w1, 0.1)
    for _ in range(3):
        x = jax.nn.leaky_relu(x @ w2, 0.1)
    return x.sum()
t = timed(jax.jit(tower), a, w1, w2) - base
fl = 2*a.shape[0]*(284*256 + 3*256*256)
print(f"4-layer tower [1M rows] bf16: {t*1e3:.2f} ms ({fl/t/1e12:.1f} TFLOP/s)", flush=True)
