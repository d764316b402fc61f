import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
import jax, jax.numpy as jnp

H, W, K = 1080, 1920, 8
key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (5, H, W), jnp.float32)
dyrel = jax.random.randint(key, (H, W), -3, 3, jnp.int32)
dxrel = jax.random.randint(key, (H, W), -3, 3, jnp.int32)
w4 = [jax.random.uniform(key, (H, W)) for _ in range(4)]
ho = jax.random.randint(key, (H, W), 0, 4, jnp.int32).astype(jnp.float32)

def window_xla(packed, dyrel, dxrel, w4, ho):
    acc = [jnp.zeros((H, W)) for _ in range(4)]
    cy = {o: dyrel == o for o in range(-K-1, K+1)}
    for l in range(-K, K+1):
        cx0 = dxrel == l
        cx1 = dxrel == l-1
        pl_ = jnp.roll(packed, -l, axis=2)
        for o in range(-K, K+1):
            po = jnp.roll(pl_, -o, axis=1)
            coeff = (jnp.where(cy[o] & cx0, w4[0], 0.) + jnp.where(cy[o] & cx1, w4[1], 0.)
                   + jnp.where(cy[o-1] & cx0, w4[2], 0.) + jnp.where(cy[o-1] & cx1, w4[3], 0.))
            coeff = jnp.where(po[4] == ho, coeff, 0.)
            for c in range(4):
                acc[c] = acc[c] + coeff * po[c]
    return acc

fn = jax.jit(window_xla)
t0 = time.perf_counter()
o = fn(packed, dyrel, dxrel, w4, ho); jax.block_until_ready(o)
print(f"compile: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for i in range(10): o = fn(packed, dyrel+0*i, dxrel, w4, ho)
jax.block_until_ready(o)
print(f"window_xla fwd: {(time.perf_counter()-t0)/10*1e3:.1f} ms")

g = jax.jit(jax.grad(lambda p: sum(jnp.sum(x) for x in window_xla(p, dyrel, dxrel, w4, ho))))
t0 = time.perf_counter()
og = g(packed); jax.block_until_ready(og)
print(f"grad compile: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for i in range(5): og = g(packed)
jax.block_until_ready(og)
print(f"window_xla bwd: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
