import time
import jax, jax.numpy as jnp
from diffmst_tpu import ops
SR=44100.0; B,T = 8, 262144
key=jax.random.PRNGKey(0)
x = jax.random.normal(key,(B,1,T),jnp.float32)*0.01
eqp = {}
for nm,f in zip(["low_shelf","band0","band1","band2","band3","high_shelf"],[200.,500.,3e3,9e3,13e3,1e4]):
    eqp[f"{nm}_gain_db"]=jnp.linspace(-6,6,B); eqp[f"{nm}_cutoff_freq"]=jnp.full(B,f); eqp[f"{nm}_q_factor"]=jnp.full(B,1.)
cp = dict(threshold_db=jnp.full(B,-30.), ratio=jnp.full(B,4.), attack_ms=jnp.full(B,10.),
          release_ms=jnp.full(B,60.), knee_db=jnp.full(B,6.), makeup_gain_db=jnp.full(B,3.))

def timeit(name, fn):
    K=20
    loop = jax.jit(lambda a0: jax.lax.fori_loop(0, K, lambda i,a: fn(a)*0.999, a0))
    jax.block_until_ready(loop(x))
    t0=time.perf_counter(); jax.block_until_ready(loop(x)); dt=(time.perf_counter()-t0)/K
    print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)

timeit("rfft+irfft", lambda x: jnp.fft.irfft(jnp.fft.rfft(x,axis=-1),n=T,axis=-1))
timeit("eq fwd+bwd", lambda x: jax.grad(lambda y: jnp.sum(jnp.square(ops.parametric_eq(y,SR,**eqp))))(x))
timeit("comp fsm fwd+bwd", lambda x: jax.grad(lambda y: jnp.sum(jnp.square(ops.compressor(y,SR,**cp,smoother='fsm'))))(x))
timeit("comp scan fwd+bwd", lambda x: jax.grad(lambda y: jnp.sum(jnp.square(ops.compressor(y,SR,**cp,smoother='scan'))))(x))
