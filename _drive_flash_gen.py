import numpy as np, jax, jax.numpy as jnp, dataclasses
from tdc_video_tpu.config import LM_TINY
from tdc_video_tpu.models.lm import init_lm
from tdc_video_tpu.serving.generate import generate_text_only
print("start", flush=True)
cfg = dataclasses.replace(LM_TINY, hidden_size=256, num_heads=4, num_kv_heads=2,
                          head_dim=64, intermediate_size=512, vocab_size=1024,
                          pad_token_id=0, eos_token_ids=(1,))
class C: lm = cfg; dtype = jnp.bfloat16
params = {"lm": init_lm(jax.random.PRNGKey(0), cfg)}
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(2, 1000, (2, 300)), jnp.int32)
mask = jnp.ones((2, 300), bool).at[1, 250:].set(False)
t1 = generate_text_only(C, params, ids, mask, max_new_tokens=8, attn_impl="xla")
print("xla:  ", np.asarray(t1), flush=True)
t2 = generate_text_only(C, params, ids, mask, max_new_tokens=8, attn_impl="flash")
print("flash:", np.asarray(t2), flush=True)
assert (np.asarray(t1) == np.asarray(t2)).all(), "MISMATCH"
print("greedy tokens identical under flash prefill")
