"""Continuous batching: an admission queue over one shared decode loop.

Capability upgrade over the reference's one-request `generate`
(tdc/cambrian_qwen.py:441-457, which stashes vision state on `self` and can
only serve a single conversation at a time): here a fixed pool of KV-cache
slots decodes in lockstep — a single jitted masked decode step over all
slots — while new requests are admitted into free slots between decode
chunks, so a long generation never blocks a short one behind it.

TPU design notes:
* one cache of shape [layers, num_slots, capacity, heads, dim]; admission is
  a `lax.dynamic_update_slice` of a batch-1 prefilled cache into the slot
  axis — no recompile, no reshuffling of live slots;
* the decode loop runs in chunks of `chunk_tokens` inside one
  `lax.while_loop` compile; the host only re-enters between chunks to admit
  or harvest, amortizing dispatch latency;
* inactive slots ride through the batched matmuls masked (models/lm.py
  decode_step(active=...)) — idle slots cost FLOPs but no correctness or
  compile-count complexity, the right trade at small slot counts;
* spec_window >= 2 swaps the per-token lockstep for a K-token verify
  lockstep (models/lm.verify_step) with per-slot prompt-lookup drafts
  (serving/speculative.py): slots at different acceptance rates advance
  independently inside the same compile, still exact greedy;
* prefill_chunk > 0 interleaves admission with decoding (Sarathi-style):
  a long prompt prefills `prefill_chunk` tokens per decode chunk via
  models/lm.extend_prefill, so the decode stall seen by active slots is one
  chunk's latency, not the whole prompt's.  Chunking commits the same KV and
  logits as a one-shot prefill up to bf16 reduction order (~0.2% rel, the
  same epsilon class as flash-vs-XLA attention); greedy output can differ
  only at near-ties;
* per-request sampling (Request.temperature/top_k/top_p/seed, the reference
  demo's do_sample path, main.py:64-65) runs in a separately-compiled
  sampled chunk with counter-mode PRNG keys (generate.sample_rows): a
  request's stream depends only on (seed, token index), never on slot
  placement or batchmates, and greedy rows in a mixed batch stay
  token-identical to the greedy chunk;
* mesh=... serves tensor-parallel: params sharded with lm_param_spec, the
  shared KV cache sharded over the same `model` axis as the heads
  (parallel.sharding.kv_cache_spec) so cache reads/writes stay local, and
  GSPMD inserts the one reduce per layer on ICI — multi-request serving of
  models one chip cannot hold.
"""

from __future__ import annotations

import time as _time

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TDCConfig
from ..models import lm as lm_mod

Params = Any


@dataclass
class Request:
    """One decode request: an already-embedded prompt (text-only or the
    packed multimodal prefix from prepare_multimodal_inputs)."""

    embeds: jnp.ndarray  # [1, L, H] right-padded
    attn_mask: jnp.ndarray  # [1, L] bool
    max_new_tokens: int = 64
    uid: Any = None
    # optional TEXT token ids of the prompt, used only to seed prompt-lookup
    # drafting when the engine runs with spec_window >= 2 (the packed
    # multimodal embeds have no token identity).  None = draft from the
    # generated tokens alone (self-speculation).
    prompt_ids: Optional[np.ndarray] = None
    # shared-prefix admission: requests carrying the same prefix_key declare
    # that embeds[:, :prefix_len] are IDENTICAL across them (e.g. the packed
    # video tokens + template head of a multi-question prompt).  The engine
    # prefills that prefix once per key and admits each request by extending
    # only its suffix (models/lm.extend_prefill) — the dominant serving cost
    # for multi-question video QA.
    prefix_key: Any = None
    prefix_len: int = 0
    # wall-clock budget in seconds, measured from submit(); a request past
    # its timeout is finalized with timed_out=True at the next chunk boundary
    # (queued: before its prefill ever runs)
    timeout_s: Optional[float] = None
    # per-request sampling (the reference demo path: do_sample=True,
    # temperature=0.2 through HF generate, /root/reference/main.py:64-65,
    # which applies HF's warper order temperature -> top-k -> top-p).
    # temperature 0.0 = greedy (every eval harness).  `seed` drives a
    # counter-mode PRNG keyed on (seed, token index), so a sampled request's
    # stream is reproducible and independent of slot placement and batch
    # composition (serving/generate.sample_rows).  Sampling is incompatible
    # with spec_window >= 2 (speculation is exact-greedy only).
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0
    # multi-turn continuation: when set, the engine snapshots this request's
    # slot cache (prompt + generated KV) into its prefix store under this key
    # at finish, exempt from prefix GC until release_prefix(key).  A follow-up
    # request then admits with prefix_key=<same key> and prefix_len=kv_len,
    # extending only the new turn's tokens — the video prompt and every prior
    # turn never re-prefill (serving/session.ChatSession).
    keep_prefix: Any = None
    # filled by the engine
    tokens: List[int] = field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    timed_out: bool = False
    submit_t: float = 0.0
    kv_len: int = 0  # at finish with keep_prefix: committed cache length
    # (prompt + generated tokens whose KV was written; the trailing
    # uncommitted tokens must be re-fed by the continuation)


@dataclass
class _PendingPrefill:
    """A prefill in flight under chunked admission (prefill_chunk > 0): the
    engine advances it one chunk per run() iteration, interleaved with decode
    chunks, so admitting a long prompt never stalls active slots for the
    whole prefill."""

    req: Request
    key: Any  # prefix_key being built, or None for a plain prompt
    embeds: jnp.ndarray  # [1, N, H] the valid tokens still to feed (no pad)
    total: int  # N
    cache1: Dict  # capacity-length batch-1 cache being filled
    pos: int = 0  # tokens committed so far
    first: Any = None  # last chunk's next-token argmax (valid when pos==total)
    first_logits: Any = None  # last chunk's next-token logits (for sampling)


def _extract_cache(shared: Dict, slot) -> Dict:
    """Inverse of _insert_cache: slice one slot back out as a batch-1
    capacity-length cache (the donor format _extend_one consumes)."""
    out = {}
    for key in ("k", "v", "k_scale", "v_scale"):
        if key in shared:
            out[key] = jax.lax.dynamic_slice_in_dim(shared[key], slot, 1, axis=1)
    out["mask"] = jax.lax.dynamic_slice_in_dim(shared["mask"], slot, 1, axis=0)
    out["lengths"] = jax.lax.dynamic_slice_in_dim(shared["lengths"], slot, 1, axis=0)
    return out


def _insert_cache(shared: Dict, one: Dict, slot: int) -> Dict:
    """Scatter a batch-1 prefilled cache into `slot` of the shared cache."""
    S1 = one["k"].shape[2]
    S = shared["k"].shape[2]
    pad = S - S1
    out = dict(shared)
    for key in ("k", "v"):
        x = jnp.pad(one[key], ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        out[key] = jax.lax.dynamic_update_slice(shared[key], x, (0, slot, 0, 0, 0))
    for key in ("k_scale", "v_scale"):  # int8 KV cache (models/lm.py)
        if key in shared:
            x = jnp.pad(one[key], ((0, 0), (0, 0), (0, pad), (0, 0)))
            out[key] = jax.lax.dynamic_update_slice(shared[key], x, (0, slot, 0, 0))
    m = jnp.pad(one["mask"], ((0, 0), (0, pad)))
    out["mask"] = jax.lax.dynamic_update_slice(shared["mask"], m, (slot, 0))
    out["lengths"] = shared["lengths"].at[slot].set(one["lengths"][0])
    return out


class DecodeEngine:
    """Fixed-slot continuous-batching decoder."""

    def __init__(
        self,
        cfg: TDCConfig,
        params: Params,
        num_slots: int = 4,
        capacity: int = 1024,
        chunk_tokens: int = 16,
        attn_impl: str = "xla",
        kv_quant: Optional[str] = None,  # "int8": halve shared-cache HBM traffic
        act_quant: bool = False,  # int8 MXU prefill (decode stays weight-only)
        spec_window: int = 0,  # >=2: speculative lockstep decode (greedy)
        spec_ngram: int = 3,
        prefill_chunk: int = 0,  # >0: chunked admission — prefill long
        # prompts `prefill_chunk` tokens at a time, one chunk per decode
        # chunk, bounding the decode stall of active slots to one chunk's
        # latency instead of the whole prompt's (Sarathi-style interleaving;
        # same math as one-shot prefill, bf16 reduction-order epsilon)
        mesh=None,  # jax.sharding.Mesh: tensor-parallel serving (params must
        # already be sharded with parallel.sharding.lm_param_spec over it)
        on_tokens=None,  # callable(req, new_token_ids): token streaming —
        # invoked after admission (the first token) and after every decode
        # chunk harvest with the tokens appended since the last call, so a
        # caller can surface partial answers while other slots still decode
    ):
        self.cfg = cfg
        self.params = params
        self.num_slots = num_slots
        self.capacity = capacity
        self.chunk_tokens = chunk_tokens
        self.attn_impl = attn_impl
        self.kv_quant = kv_quant
        self.act_quant = act_quant
        self.spec_window = spec_window
        self.spec_ngram = spec_ngram
        if prefill_chunk < 0 or prefill_chunk > capacity:
            raise ValueError(f"prefill_chunk {prefill_chunk} not in [0, {capacity}]")
        self.prefill_chunk = prefill_chunk
        self._pending: Optional[_PendingPrefill] = None
        self.mesh = mesh
        self.on_tokens = on_tokens
        self.on_tokens_errors: List[Exception] = []

        self.cache = lm_mod.init_kv_cache(cfg.lm, num_slots, capacity, cfg.dtype, quant=kv_quant)
        if mesh is not None:
            # Shard the shared cache over the same `model` axis as the
            # attention heads (zero-collective cache reads/writes) and pin the
            # small per-slot state replicated on the mesh so every jitted
            # chunk sees colocated inputs.
            from ..parallel.sharding import kv_cache_spec, shard_tree

            self.cache = shard_tree(self.cache, kv_cache_spec(self.cache), mesh)
        self._requests: List[Optional[Request]] = [None] * num_slots
        self._budget = np.zeros(num_slots, np.int32)  # tokens remaining
        self._last_tok = self._rep(jnp.zeros((num_slots,), jnp.int32))
        self._active = self._rep(jnp.zeros((num_slots,), jnp.bool_))
        self._queue: List[Request] = []
        self._finished: List[Request] = []
        self._prefixes: Dict[Any, Dict] = {}  # prefix_key -> prefilled b1 cache
        self._kept: set = set()  # keep_prefix keys: session donors exempt
        # from _gc_prefixes until release_prefix()/reset()
        self.steps = 0  # jitted chunk invocations (for tests/telemetry)
        self.prefix_prefills = 0  # telemetry: full-prefix prefills actually run
        self.prefill_chunks = 0  # telemetry: chunked-admission extends run
        self.chunk_times: List[float] = []  # perf_counter after each decode
        # chunk harvest — gaps between entries are the inter-token latency an
        # active stream actually sees (admission stalls show up as outliers)
        self.chunk_spans: List[tuple] = []  # (t_dispatch, t_harvested, n_tok)
        # per decode chunk: duration excludes admission/prefill between
        # chunks, so sum(n)/sum(t1-t0) is the steady-state decode rate
        self._harvested_last = 0

        if spec_window >= 2:
            # per-slot token history for prompt-lookup drafting: prompt TEXT
            # ids (<= capacity by the admit check) + generated tokens
            self._hist_cap = capacity + spec_window + 1
            self._hist = self._rep(jnp.zeros((num_slots, self._hist_cap), jnp.int32))
            self._hist_len = self._rep(jnp.zeros((num_slots,), jnp.int32))
            self._jchunk_spec = jax.jit(self._decode_chunk_spec)
            self._jchunk_spec_sampled = jax.jit(self._decode_chunk_spec_sampled)

        # per-slot sampling state (Request.temperature > 0): the sampled
        # chunk kernel compiles separately so all-greedy workloads never pay
        # the per-step vocab sorts; greedy rows inside a mixed batch take the
        # exact argmax either way (generate.sample_rows)
        self._temp = self._rep(jnp.zeros((num_slots,), jnp.float32))
        self._topk = self._rep(jnp.zeros((num_slots,), jnp.int32))
        self._topp = self._rep(jnp.ones((num_slots,), jnp.float32))
        self._seed = self._rep(jnp.zeros((num_slots,), jnp.int32))
        self._genidx = self._rep(jnp.zeros((num_slots,), jnp.int32))

        from .generate import sample_rows as _sample_rows

        self._jprefill = jax.jit(self._prefill_one, static_argnums=(3,))
        self._jprefix = jax.jit(self._prefill_prefix)
        self._jextend = jax.jit(self._extend_one)
        self._jextract = jax.jit(_extract_cache)
        self._jchunk = jax.jit(self._decode_chunk)
        self._jchunk_sampled = jax.jit(self._decode_chunk_sampled)
        self._jsample_first = jax.jit(_sample_rows)

    def reset(self, on_tokens=None):
        """Clear per-run request state so the engine can be reused across
        independent batches (eval answer_many reuses engines keyed on their
        compile shape).  The jitted kernels and KV buffers survive — slot
        reads are length-masked, so stale cache content from a previous run
        is unreachable — which is the whole point: reuse skips the per-call
        prefill/decode recompiles a fresh engine would pay."""
        self._pending = None
        self._requests = [None] * self.num_slots
        self._budget = np.zeros(self.num_slots, np.int32)
        self._last_tok = self._rep(jnp.zeros((self.num_slots,), jnp.int32))
        self._active = self._rep(jnp.zeros((self.num_slots,), jnp.bool_))
        self._queue = []
        self._finished = []
        self._prefixes = {}
        self._kept = set()
        self.steps = 0
        self.prefix_prefills = 0
        self.prefill_chunks = 0
        self.chunk_times = []
        self.chunk_spans = []
        self._harvested_last = 0
        if self.spec_window >= 2:
            self._hist = self._rep(
                jnp.zeros((self.num_slots, self._hist_cap), jnp.int32)
            )
            self._hist_len = self._rep(jnp.zeros((self.num_slots,), jnp.int32))
        self._temp = self._rep(jnp.zeros((self.num_slots,), jnp.float32))
        self._topk = self._rep(jnp.zeros((self.num_slots,), jnp.int32))
        self._topp = self._rep(jnp.ones((self.num_slots,), jnp.float32))
        self._seed = self._rep(jnp.zeros((self.num_slots,), jnp.int32))
        self._genidx = self._rep(jnp.zeros((self.num_slots,), jnp.int32))
        self.on_tokens = on_tokens
        self.on_tokens_errors = []

    def _rep(self, x):
        """Replicate a small state array onto the serving mesh (no-op
        single-device): jitted chunks need all inputs colocated."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P()))

    # -- jitted kernels -----------------------------------------------------

    def _prefill_one(self, params, embeds, attn_mask, L):
        cache1 = lm_mod.init_kv_cache(self.cfg.lm, 1, L, self.cfg.dtype, quant=self.kv_quant)
        logits, cache1 = lm_mod.prefill(
            self.cfg.lm, params["lm"], embeds, attn_mask, cache1,
            attn_impl=self.attn_impl, dtype=self.cfg.dtype,
            act_quant=self.act_quant,
        )
        return jnp.argmax(logits, -1).astype(jnp.int32), logits, cache1

    def _prefill_prefix(self, params, embeds, attn_mask):
        """Prefill a shared prefix into a batch-1 cache at FULL engine
        capacity (so per-request suffixes can extend it in place)."""
        cache1 = lm_mod.init_kv_cache(
            self.cfg.lm, 1, self.capacity, self.cfg.dtype, quant=self.kv_quant
        )
        _, cache1 = lm_mod.prefill(
            self.cfg.lm, params["lm"], embeds, attn_mask, cache1,
            attn_impl=self.attn_impl, dtype=self.cfg.dtype,
            act_quant=self.act_quant,
        )
        return cache1

    def _extend_one(self, params, suffix_embeds, n_valid, cache1):
        """Admit one request on top of a shared-prefix cache: forward only
        its suffix (models/lm.extend_prefill) and return the first token +
        the committed batch-1 cache ready for _insert_cache."""
        logits, cache1 = lm_mod.extend_prefill(
            self.cfg.lm, params["lm"], suffix_embeds, n_valid, cache1,
            attn_impl=self.attn_impl, dtype=self.cfg.dtype,
        )
        return jnp.argmax(logits, -1).astype(jnp.int32), logits, cache1

    def _decode_chunk(self, params, cache, tok, active, budget):
        eos = jnp.asarray(self.cfg.lm.eos_token_ids, jnp.int32)

        def body(carry, _):
            cache, tok, active, budget = carry
            embeds = lm_mod.embed_tokens(self.cfg.lm, params["lm"], tok[:, None], self.cfg.dtype)
            logits, cache = lm_mod.decode_step(
                self.cfg.lm, params["lm"], embeds, cache,
                attn_impl=self.attn_impl, dtype=self.cfg.dtype, active=active,
            )
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            nxt = jnp.where(active, nxt, self.cfg.lm.pad_token_id)
            budget = budget - active.astype(budget.dtype)
            hit_eos = jnp.any(nxt[:, None] == eos[None, :], axis=-1)
            active = active & ~hit_eos & (budget > 0)
            tok = jnp.where(active | hit_eos, nxt, tok)
            return (cache, tok, active, budget), nxt

        (cache, tok, active, budget), toks = jax.lax.scan(
            body, (cache, tok, active, budget), None, length=self.chunk_tokens
        )
        return cache, tok, active, budget, toks.T  # [slots, chunk]

    def _decode_chunk_sampled(
        self, params, cache, tok, active, budget, temp, topk, topp, seed, gidx
    ):
        """Sampled lockstep chunk: per-slot HF-warper-order sampling
        (generate.sample_rows) with counter-mode keys carried as a per-slot
        token index `gidx`.  Greedy rows (temperature 0) take exactly the
        greedy chunk's argmax, so mixed batches stay token-identical for
        them.  Compiled separately from _decode_chunk: all-greedy workloads
        never pay the per-step vocab sorts."""
        from .generate import sample_rows

        eos = jnp.asarray(self.cfg.lm.eos_token_ids, jnp.int32)

        def body(carry, _):
            cache, tok, active, budget, gidx = carry
            embeds = lm_mod.embed_tokens(self.cfg.lm, params["lm"], tok[:, None], self.cfg.dtype)
            logits, cache = lm_mod.decode_step(
                self.cfg.lm, params["lm"], embeds, cache,
                attn_impl=self.attn_impl, dtype=self.cfg.dtype, active=active,
            )
            nxt = sample_rows(logits, temp, topk, topp, seed, gidx)
            nxt = jnp.where(active, nxt, self.cfg.lm.pad_token_id)
            gidx = gidx + active.astype(gidx.dtype)
            budget = budget - active.astype(budget.dtype)
            hit_eos = jnp.any(nxt[:, None] == eos[None, :], axis=-1)
            active = active & ~hit_eos & (budget > 0)
            tok = jnp.where(active | hit_eos, nxt, tok)
            return (cache, tok, active, budget, gidx), nxt

        (cache, tok, active, budget, gidx), toks = jax.lax.scan(
            body, (cache, tok, active, budget, gidx), None, length=self.chunk_tokens
        )
        return cache, tok, active, budget, gidx, toks.T  # [slots, chunk]

    def _decode_chunk_spec(self, params, cache, tok, active, budget, hist, hist_len):
        """Speculative lockstep chunk: each scan iteration is ONE K-token
        verify forward over all slots (models/lm.verify_step) with per-slot
        prompt-lookup drafts and per-slot accept counts — slots at different
        acceptance rates advance independently inside the same compile.
        Emits up to chunk_tokens * window tokens per chunk; the host packs
        the ragged (greedy, m) pairs in _harvest_spec."""
        from .speculative import accept_and_emit, propose_ngram

        eos = jnp.asarray(self.cfg.lm.eos_token_ids, jnp.int32)
        K = self.spec_window
        srange = jnp.arange(self.num_slots)

        def body(carry, _):
            cache, tok, active, budget, hist, hist_len = carry
            draft, _ = propose_ngram(hist, hist_len, self.spec_ngram, K - 1)
            tokens = jnp.concatenate([tok[:, None], draft], axis=1)
            embeds = lm_mod.embed_tokens(self.cfg.lm, params["lm"], tokens, self.cfg.dtype)
            logits, cache = lm_mod.verify_step(
                self.cfg.lm, params["lm"], embeds, cache,
                attn_impl=self.attn_impl, dtype=self.cfg.dtype,
            )
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [slots, K]
            m, eos_emitted = accept_and_emit(g, draft, eos, budget, ~active)
            for j in range(K):
                sel = j < m
                hpos = jnp.minimum(hist_len + j, self._hist_cap - 1)
                hist = hist.at[srange, hpos].set(
                    jnp.where(sel, g[:, j], hist[srange, hpos])
                )
            hist_len = hist_len + m
            cache = lm_mod.commit_verified(cache, m)
            new_last = jnp.take_along_axis(
                g, jnp.maximum(m - 1, 0)[:, None], axis=1
            )[:, 0]
            tok = jnp.where(m > 0, new_last, tok)
            budget = budget - m
            active = active & ~eos_emitted & (budget > 0)
            return (cache, tok, active, budget, hist, hist_len), (g, m)

        (cache, tok, active, budget, hist, hist_len), (gs, ms) = jax.lax.scan(
            body, (cache, tok, active, budget, hist, hist_len), None,
            length=self.chunk_tokens,
        )
        return cache, tok, active, budget, hist, hist_len, gs, ms

    def _decode_chunk_spec_sampled(
        self, params, cache, tok, active, budget, hist, hist_len,
        temp, topk, topp, seed, gidx,
    ):
        """Speculative SAMPLING lockstep chunk: the same K-token verify shape
        as _decode_chunk_spec, but acceptance is the rejection-sampling rule
        for deterministic drafts (speculative.accept_and_emit_sampled) — every
        emitted token is exactly warped-target-distributed, accepted drafts
        arrive K-at-a-time, and greedy rows (temperature 0) in a mixed batch
        stay token-identical to the greedy spec engine."""
        from .speculative import accept_and_emit_sampled, propose_ngram

        eos = jnp.asarray(self.cfg.lm.eos_token_ids, jnp.int32)
        K = self.spec_window
        srange = jnp.arange(self.num_slots)

        def body(carry, _):
            cache, tok, active, budget, hist, hist_len, gidx = carry
            draft, _ = propose_ngram(hist, hist_len, self.spec_ngram, K - 1)
            tokens = jnp.concatenate([tok[:, None], draft], axis=1)
            embeds = lm_mod.embed_tokens(self.cfg.lm, params["lm"], tokens, self.cfg.dtype)
            logits, cache = lm_mod.verify_step(
                self.cfg.lm, params["lm"], embeds, cache,
                attn_impl=self.attn_impl, dtype=self.cfg.dtype,
            )
            e, m, eos_emitted = accept_and_emit_sampled(
                logits, draft, eos, budget, ~active, temp, topk, topp, seed, gidx
            )
            for j in range(K):
                sel = j < m
                hpos = jnp.minimum(hist_len + j, self._hist_cap - 1)
                hist = hist.at[srange, hpos].set(
                    jnp.where(sel, e[:, j], hist[srange, hpos])
                )
            hist_len = hist_len + m
            gidx = gidx + m
            cache = lm_mod.commit_verified(cache, m)
            new_last = jnp.take_along_axis(
                e, jnp.maximum(m - 1, 0)[:, None], axis=1
            )[:, 0]
            tok = jnp.where(m > 0, new_last, tok)
            budget = budget - m
            active = active & ~eos_emitted & (budget > 0)
            return (cache, tok, active, budget, hist, hist_len, gidx), (e, m)

        (cache, tok, active, budget, hist, hist_len, gidx), (es, ms) = jax.lax.scan(
            body, (cache, tok, active, budget, hist, hist_len, gidx), None,
            length=self.chunk_tokens,
        )
        return cache, tok, active, budget, hist, hist_len, gidx, es, ms

    # -- host-side engine ---------------------------------------------------

    def submit(self, req: Request):
        req.submit_t = _time.perf_counter()
        self._queue.append(req)

    def cancel(self, uid: Any) -> bool:
        """Cancel the request with this uid: queued (or pending-prefill)
        requests are finalized immediately; an in-flight slot is released at
        the next chunk boundary.  The request lands in run()'s result list
        with cancelled=True and whatever tokens it had produced.  Returns
        False when no live request has the uid."""
        for req in self._queue:
            if req.uid == uid:
                req.cancelled = True
                return True
        if self._pending is not None and self._pending.req.uid == uid:
            self._pending.req.cancelled = True
            return True
        for req in self._requests:
            if req is not None and req.uid == uid:
                req.cancelled = True
                return True
        return False

    def _emit_tokens(self, req: Request, new: List[int]):
        """on_tokens with exception isolation: a raising user callback must
        not corrupt engine state — an error propagating out of a harvest
        would strand the remaining slots' tokens of that chunk and leave
        finished requests occupying their slots forever.  Errors are
        collected in `on_tokens_errors` (streaming degrades, decoding
        completes); callers who must fail hard can inspect it after run()."""
        if self.on_tokens is None:
            return
        try:
            self.on_tokens(req, new)
        except Exception as e:
            self.on_tokens_errors.append(e)

    def _expired(self, req: Request) -> bool:
        return req.timeout_s is not None and (
            _time.perf_counter() - req.submit_t > req.timeout_s
        )

    def _finalize_dead(self, req: Request):
        req.timed_out = req.timed_out or (not req.cancelled and self._expired(req))
        req.done = True
        self._finished.append(req)

    def _sweep_dead(self):
        """Release cancelled/timed-out requests wherever they live.  Runs at
        every chunk boundary, so a cancel() or timeout takes effect within
        one decode chunk — a queued victim never even prefills."""
        keep = []
        for r in self._queue:
            if r.cancelled or self._expired(r):
                self._finalize_dead(r)
            else:
                keep.append(r)
        self._queue = keep
        if self._pending is not None:
            req = self._pending.req
            if req.cancelled or self._expired(req):
                self._finalize_dead(req)
                self._pending = None  # drop the half-built cache
        freed = []
        for slot in range(self.num_slots):
            req = self._requests[slot]
            if req is not None and (req.cancelled or self._expired(req)):
                self._finalize_dead(req)
                self._requests[slot] = None
                self._budget[slot] = 0
                freed.append(slot)
        if freed:
            act = self._active
            for slot in freed:
                act = act.at[slot].set(False)
            self._active = self._rep(act)

    def _free_slot(self) -> Optional[int]:
        for slot in range(self.num_slots):
            if self._requests[slot] is None and not bool(self._active[slot]):
                return slot
        return None

    def _start_pending(self, req: Request, key: Any, n: int):
        """Begin a chunked prefill over embeds[:, :n] (all-valid tokens).
        The capacity-length batch-1 cache is filled by _advance_pending one
        prefill_chunk per run() iteration."""
        cache1 = lm_mod.init_kv_cache(
            self.cfg.lm, 1, self.capacity, self.cfg.dtype, quant=self.kv_quant
        )
        if self.mesh is not None:
            # keep the chunked batch-1 cache on the same head-axis sharding
            # as the shared cache so extends stay collective-free
            from ..parallel.sharding import kv_cache_spec, shard_tree

            cache1 = shard_tree(cache1, kv_cache_spec(cache1), self.mesh)
        self._pending = _PendingPrefill(
            req=req, key=key, embeds=req.embeds[:, :n], total=n, cache1=cache1
        )

    def _extend_suffix(self, req: Request, donor: Dict):
        """Admit a shared-prefix request by extending its suffix over the
        donor prefix cache (functional: the donor stays reusable)."""
        p = req.prefix_len
        n_valid = int(np.asarray(req.attn_mask).sum()) - p
        return self._jextend(
            self.params,
            self._rep(req.embeds[:, p:]),
            self._rep(jnp.asarray([n_valid], jnp.int32)),
            donor,
        )

    def _admit(self):
        while self._queue and self._pending is None:
            slot = self._free_slot()
            if slot is None:
                return
            req = self._queue.pop(0)
            L = req.embeds.shape[1]
            if L > self.capacity:
                raise ValueError(f"prompt length {L} exceeds capacity {self.capacity}")
            if req.prefix_key is not None and req.prefix_len > 0:
                p = req.prefix_len
                if p >= L:
                    raise ValueError(
                        f"prefix_len {p} >= prompt length {L}: a request must "
                        "contribute at least one suffix token"
                    )
                if not bool(np.asarray(req.attn_mask[:, :p]).all()):
                    raise ValueError("shared prefix must be fully valid tokens")
                if int(np.asarray(req.attn_mask).sum()) - p <= 0:
                    raise ValueError(
                        f"prompt valid length <= prefix_len {p}: a request "
                        "must contribute at least one suffix token"
                    )
                if req.prefix_key not in self._prefixes:
                    if 0 < self.prefill_chunk < p:
                        self._start_pending(req, req.prefix_key, p)
                        return
                    self._prefixes[req.prefix_key] = self._jprefix(
                        self.params,
                        self._rep(req.embeds[:, :p]),
                        self._rep(req.attn_mask[:, :p]),
                    )
                    self.prefix_prefills += 1
                first, logits, cache1 = self._extend_suffix(req, self._prefixes[req.prefix_key])
            else:
                mask = np.asarray(req.attn_mask)
                n = int(mask.sum())
                # chunked admission needs a right-padded mask (chunks feed the
                # valid head); anything else falls back to one-shot prefill
                if 0 < self.prefill_chunk < n and bool(mask[0, :n].all()):
                    self._start_pending(req, None, n)
                    return
                first, logits, cache1 = self._jprefill(
                    self.params, self._rep(req.embeds), self._rep(req.attn_mask), L
                )
            self._finish_admission(req, self._first_token(req, first, logits), cache1)

    def _advance_pending(self):
        """Advance the in-flight chunked prefill by one chunk.  The RAGGED
        chunk is taken FIRST (k = total % C), so every later window is a full
        C tokens with write span [pos, pos+C) <= total <= capacity —
        extend_prefill requires lengths + K <= capacity, and a ragged TAIL
        chunk would pad past `total` and violate it near capacity."""
        p = self._pending
        C = self.prefill_chunk
        k = (p.total % C or C) if p.pos == 0 else C
        seg = p.embeds[:, p.pos : p.pos + k]
        if k < C:
            seg = jnp.pad(seg, ((0, 0), (0, C - k), (0, 0)))
        p.first, p.first_logits, p.cache1 = self._jextend(
            self.params, self._rep(seg), self._rep(jnp.asarray([k], jnp.int32)), p.cache1
        )
        p.pos += k
        self.prefill_chunks += 1
        if p.pos < p.total:
            return
        self._pending = None
        if p.key is not None:
            self._prefixes[p.key] = p.cache1
            self.prefix_prefills += 1
            first, logits, cache1 = self._extend_suffix(p.req, p.cache1)
            self._finish_admission(
                p.req, self._first_token(p.req, first, logits), cache1
            )
        else:
            self._finish_admission(
                p.req, self._first_token(p.req, p.first, p.first_logits), p.cache1
            )

    def _first_token(self, req: Request, greedy_tok, logits) -> int:
        """First generated token from the prefill logits: greedy requests use
        the in-graph argmax; sampled requests draw index 0 of their
        counter-mode stream through the SAME sample_rows math the decode
        chunk uses, so the whole stream is one consistent key schedule."""
        if req.temperature <= 0.0:
            return int(greedy_tok[0])
        one = lambda v, dt: self._rep(jnp.asarray([v], dt))
        t = self._jsample_first(
            logits,
            one(req.temperature, jnp.float32),
            one(req.top_k, jnp.int32),
            one(req.top_p, jnp.float32),
            one(req.seed, jnp.int32),
            one(0, jnp.int32),
        )
        return int(t[0])

    def _finish_admission(self, req: Request, first_i: int, cache1: Dict):
        slot = self._free_slot()
        assert slot is not None  # held free: _admit blocks while pending
        L = req.embeds.shape[1]
        self.cache = _insert_cache(self.cache, cache1, slot)
        req.tokens.append(first_i)
        self._emit_tokens(req, [first_i])
        # Each decode step writes KV at position `lengths`; generating G
        # post-prefill tokens needs L+G <= capacity, else decode_step's
        # write_pos clamp (models/lm.py) would silently overwrite the last
        # cache row every step.  Truncate the budget to what fits.  A
        # speculative verify additionally writes its whole K-window before
        # acceptance, so reserve K-1 slots of headroom too (a clamped tail
        # write must land on an uncommitted slot).
        headroom = max(self.spec_window - 1, 0)
        budget = min(req.max_new_tokens - 1, self.capacity - L - headroom)
        if first_i in self.cfg.lm.eos_token_ids or budget <= 0:
            self._keep_snapshot_cache1(req, cache1)
            req.done = True
            self._finished.append(req)
            return
        self._requests[slot] = req
        self._budget[slot] = budget
        self._last_tok = self._last_tok.at[slot].set(first_i)
        self._active = self._active.at[slot].set(True)
        self._temp = self._temp.at[slot].set(req.temperature)
        self._topk = self._topk.at[slot].set(req.top_k)
        self._topp = self._topp.at[slot].set(req.top_p)
        self._seed = self._seed.at[slot].set(req.seed)
        self._genidx = self._genidx.at[slot].set(1)  # index 0 = first token
        if self.spec_window >= 2:
            ids = req.prompt_ids
            row = jnp.zeros((self._hist_cap,), jnp.int32)
            n = 0
            if ids is not None:
                ids = np.asarray(ids, np.int32).reshape(-1)[: self.capacity]
                n = len(ids)
                row = row.at[:n].set(jnp.asarray(ids))
            row = row.at[n].set(first_i)
            self._hist = self._hist.at[slot].set(row)
            self._hist_len = self._hist_len.at[slot].set(n + 1)

    def _keep_snapshot(self, req: Request, slot: Optional[int]):
        """Snapshot a finishing keep_prefix request's KV into the prefix
        store, BEFORE its slot can be reused — the continuation donor for
        ChatSession follow-ups.  slot=None: the request finished at admission
        (EOS first token / zero budget); its batch-1 cache is padded to
        capacity to match the donor format."""
        if req.keep_prefix is None:
            return
        if slot is not None:
            self._prefixes[req.keep_prefix] = self._jextract(
                self.cache, jnp.asarray(slot, jnp.int32)
            )
            req.kv_len = int(np.asarray(self.cache["lengths"])[slot])
        self._kept.add(req.keep_prefix)

    def _keep_snapshot_cache1(self, req: Request, cache1: Dict):
        if req.keep_prefix is None:
            return
        S1 = cache1["k"].shape[2]
        pad = self.capacity - S1
        one = dict(cache1)
        if pad:
            for key in ("k", "v"):
                one[key] = jnp.pad(cache1[key], ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
            for key in ("k_scale", "v_scale"):
                if key in cache1:
                    one[key] = jnp.pad(cache1[key], ((0, 0), (0, 0), (0, pad), (0, 0)))
            one["mask"] = jnp.pad(cache1["mask"], ((0, 0), (0, pad)))
        self._prefixes[req.keep_prefix] = one
        req.kv_len = int(np.asarray(cache1["lengths"])[0])
        self._kept.add(req.keep_prefix)

    def release_prefix(self, key: Any) -> bool:
        """Drop a kept session donor (ends the conversation's KV residency;
        the HBM is reclaimed at the next _gc_prefixes)."""
        self._kept.discard(key)
        return self._prefixes.pop(key, None) is not None

    def _harvest(self, toks: np.ndarray, budget_before: np.ndarray):
        self._harvested_last = 0
        for slot in range(self.num_slots):
            req = self._requests[slot]
            if req is None:
                continue
            n = int(budget_before[slot] - self._budget[slot])  # active steps taken
            new = [int(t) for t in toks[slot][:n]]
            req.tokens.extend(new)
            self._harvested_last += len(new)
            if new:
                self._emit_tokens(req, new)
            if not bool(self._active[slot]):
                self._keep_snapshot(req, slot)
                req.done = True
                self._finished.append(req)
                self._requests[slot] = None

    def _harvest_spec(self, gs: np.ndarray, ms: np.ndarray):
        """Pack the ragged speculative chunk output: iteration i of slot s
        emitted gs[i, s, :ms[i, s]]."""
        self._harvested_last = 0
        for slot in range(self.num_slots):
            req = self._requests[slot]
            if req is None:
                continue
            new = []
            for i in range(gs.shape[0]):
                n = int(ms[i, slot])
                new.extend(int(t) for t in gs[i, slot, :n])
            req.tokens.extend(new)
            self._harvested_last += len(new)
            if new:
                self._emit_tokens(req, new)
            if not bool(self._active[slot]):
                self._keep_snapshot(req, slot)
                req.done = True
                self._finished.append(req)
                self._requests[slot] = None

    def _gc_prefixes(self):
        """Drop donor prefix caches no queued/pending request still needs.
        Each donor is a full-capacity batch-1 KV cache (~100 MB for 7B at 4k
        capacity), so holding them past their last consumer would leak HBM
        across a many-video serving session."""
        if not self._prefixes:
            return
        live = {r.prefix_key for r in self._queue if r.prefix_key is not None}
        if self._pending is not None and self._pending.key is not None:
            live.add(self._pending.key)
        live |= self._kept  # session donors persist until release_prefix()
        for key in [k for k in self._prefixes if k not in live]:
            del self._prefixes[key]

    def run(self) -> List[Request]:
        """Drain the queue + all slots; returns completed requests in finish
        order."""
        while (
            self._queue
            or self._pending is not None
            or any(r is not None for r in self._requests)
        ):
            self._sweep_dead()
            self._admit()
            self._gc_prefixes()
            if self._pending is not None:
                # one prefill chunk per decode chunk: the in-flight long
                # prompt advances without stalling active slots for its
                # whole prefill
                self._advance_pending()
            if not bool(jnp.any(self._active)):
                if self._queue or self._pending is not None:
                    # every admitted request finished at prefill (EOS first
                    # token / budget 0), or a chunked prefill is still in
                    # flight — keep going rather than stranding the queue.
                    continue
                break
            if self.spec_window >= 2:
                t0 = _time.perf_counter()
                if any(r is not None and r.temperature > 0.0 for r in self._requests):
                    # rejection-sampling verify (speculative sampling with
                    # deterministic drafts); compiled separately so all-greedy
                    # workloads never pay the per-position warping/sampling
                    (
                        self.cache, self._last_tok, self._active, budget,
                        self._hist, self._hist_len, self._genidx, gs, ms,
                    ) = self._jchunk_spec_sampled(
                        self.params, self.cache, self._last_tok, self._active,
                        jnp.asarray(self._budget), self._hist, self._hist_len,
                        self._temp, self._topk, self._topp, self._seed,
                        self._genidx,
                    )
                else:
                    (
                        self.cache, self._last_tok, self._active, budget,
                        self._hist, self._hist_len, gs, ms,
                    ) = self._jchunk_spec(
                        self.params, self.cache, self._last_tok, self._active,
                        jnp.asarray(self._budget), self._hist, self._hist_len,
                    )
                self._budget = np.array(budget)
                self.steps += 1
                self._harvest_spec(np.asarray(gs), np.asarray(ms))
                self.chunk_times.append(_time.perf_counter())
                self.chunk_spans.append(
                    (t0, self.chunk_times[-1], self._harvested_last)
                )
                continue
            budget_before = self._budget.copy()
            t0 = _time.perf_counter()
            if any(r is not None and r.temperature > 0.0 for r in self._requests):
                (
                    self.cache, self._last_tok, self._active, budget,
                    self._genidx, toks,
                ) = self._jchunk_sampled(
                    self.params, self.cache, self._last_tok, self._active,
                    jnp.asarray(self._budget), self._temp, self._topk,
                    self._topp, self._seed, self._genidx,
                )
            else:
                self.cache, self._last_tok, self._active, budget, toks = self._jchunk(
                    self.params, self.cache, self._last_tok, self._active,
                    jnp.asarray(self._budget),
                )
            self._budget = np.array(budget)
            self.steps += 1
            self._harvest(np.asarray(toks), budget_before)
            self.chunk_times.append(_time.perf_counter())
            self.chunk_spans.append(
                (t0, self.chunk_times[-1], self._harvested_last)
            )
        out, self._finished = self._finished, []
        return out
