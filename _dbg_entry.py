import time
import jax, jax.numpy as jnp
import __graft_entry__ as g
t0=time.time(); fn, (params, batch) = g.entry(); print("entry()", round(time.time()-t0,1), flush=True)
t0=time.time(); out = jax.eval_shape(fn, params, batch); print("eval_shape(fwd)", round(time.time()-t0,1), out.shape, flush=True)
