"""Multi-turn conversation serving: one video, many follow-up questions,
ONE resident KV cache.

The reference can only serve single-shot requests — its generate stashes
vision state on `self` and every question re-runs the towers and re-prefills
the whole prompt (/root/reference/main.py:60,
tdc/language_model/cambrian_qwen.py:441-457).  Here the first ask() packs the
video prompt and prefills once; every later ask() feeds ONLY the new turn's
tokens (the template glue + the follow-up question) on top of the finished
turn's KV, which the DecodeEngine snapshots at finish (Request.keep_prefix)
and re-admits as a shared-prefix donor (models/lm.extend_prefill).  A 10-turn
conversation over a 3.6k-token video prompt prefills ~3.6k tokens once plus
~30 tokens per follow-up instead of ~36k+ total.

Token bookkeeping: the engine commits KV for the prompt and for every
generated token EXCEPT the last one emitted (a token's KV is written when it
is fed back, and the final/EOS token never is).  Request.kv_len reports the
committed length; the continuation re-feeds the uncommitted tail before the
new turn's tokens, so the cache state is EXACTLY what a from-scratch prefill
of the whole conversation would build (token-identity tested in
tests/test_session.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.conversation import SeparatorStyle, conv_templates
from ..models import lm as lm_mod


def follow_up_text(cfg, question: str, closed: bool) -> str:
    """The template glue between a finished assistant turn and the next
    user question, per conversation family (data/conversation.py).  `closed`:
    the previous answer already ended with the template's EOS/sep token (the
    engine emits it before stopping); when the answer was cut by the token
    budget instead, the glue must supply the separator itself."""
    conv = conv_templates[cfg.conv_version]
    if conv.sep_style == SeparatorStyle.CHATML:
        head = "" if closed else conv.sep
        return (
            head + "\n" + conv.roles[0] + "\n" + question + conv.sep + "\n"
            + conv.roles[1] + "\n"
        )
    if conv.sep_style == SeparatorStyle.LLAMA_3:
        head = "" if closed else conv.sep
        return (
            head
            + f"<|start_header_id|>{conv.roles[0]}<|end_header_id|>\n\n"
            + question + conv.sep
            + f"<|start_header_id|>{conv.roles[1]}<|end_header_id|>\n\n"
        )
    # plain: messages joined by sep
    head = "" if closed else conv.sep
    return head + question + conv.sep


def encode_plain(tok, text: str) -> List[int]:
    """Tokenize WITHOUT special-token insertion (a follow-up suffix must not
    pick up a BOS mid-conversation — Llama tokenizers add one by default)."""
    inner = getattr(tok, "tok", None)
    if inner is not None:
        try:
            return list(inner(text, add_special_tokens=False).input_ids)
        except TypeError:
            pass  # offline/test tokenizers without the kwarg
    return list(tok.encode(text))


class ChatSession:
    """Multi-turn QA over one video through a persistent DecodeEngine slot.

    Usage (via TDCPredictor.chat):

        sess = predictor.chat(frames, video_uid="clip1", max_new_tokens=128)
        a1 = sess.ask("What happens in the video?")
        a2 = sess.ask("Why does she leave?")   # no re-encode, no re-prefill
        sess.close()
    """

    def __init__(
        self,
        predictor,
        frames: np.ndarray,
        wav: Optional[np.ndarray] = None,
        frame_seconds: Optional[np.ndarray] = None,
        video_uid: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        capacity: Optional[int] = None,  # total conversation token budget;
        # default: first prompt bucket + 2048 (every turn extends in place,
        # so the whole conversation must fit)
        kv_quant: Optional[str] = None,
        temperature: float = 0.0,
        top_k: int = 50,
        top_p: float = 1.0,
        seed: int = 0,
        suffix_bucket: int = 64,  # follow-up suffixes pad to this multiple
        # so repeat turns reuse one extend compile
        on_tokens=None,
    ):
        self.p = predictor
        self.frames = frames
        self.wav = wav
        self.frame_seconds = frame_seconds
        self.video_uid = video_uid
        self.max_new_tokens = max_new_tokens or predictor.max_new_tokens
        self.capacity = capacity
        self.kv_quant = kv_quant
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.seed = seed
        self.suffix_bucket = suffix_bucket
        self.on_tokens = on_tokens
        self.history: List[Tuple[str, str]] = []
        self.turn_tokens: List[List[int]] = []  # raw generated ids per turn
        self._key = ("chat", id(self))
        self._engine = None
        self._kv_len = 0  # committed cache length after the last turn
        self._tail: List[int] = []  # generated tokens not yet in the cache
        self._last_tok: Optional[int] = None
        self._turn = 0
        self._jembed = None
        self._closed = False

    # -- internals ------------------------------------------------------------

    def _embed_ids(self, ids: np.ndarray) -> jnp.ndarray:
        cfg = self.p.cfg
        if self._jembed is None:
            self._jembed = jax.jit(
                lambda params, t: lm_mod.embed_tokens(cfg.lm, params["lm"], t, cfg.dtype)
            )
        return self._jembed(self.p.params, jnp.asarray(ids, jnp.int32)[None])

    def _make_engine(self, first_len: int):
        from .batching import DecodeEngine

        cap = self.capacity or int(np.ceil((first_len + 2048) / 128) * 128)
        if cap < first_len + self.max_new_tokens:
            raise ValueError(
                f"session capacity {cap} cannot hold the first prompt "
                f"({first_len}) plus max_new_tokens ({self.max_new_tokens})"
            )
        self.capacity = cap
        self._engine = DecodeEngine(
            self.p.cfg,
            self.p.params,
            num_slots=1,
            capacity=cap,
            attn_impl=self.p.attn_impl,
            kv_quant=self.kv_quant or self.p.kv_quant,
            act_quant=self.p.act_quant,
            mesh=self.p.mesh,
            on_tokens=self.on_tokens,
        )

    def _run(self, req) -> Any:
        if self.p.mesh is not None:
            with self.p.mesh:
                done = self._engine.run()
        else:
            done = self._engine.run()
        (r,) = done
        if r.cancelled or r.timed_out:
            raise RuntimeError(f"session turn did not finish: {r!r}")
        return r

    # -- public API -------------------------------------------------------------

    def ask(self, question: str, max_new_tokens: Optional[int] = None) -> str:
        """Answer a question in this conversation.  Turn 1 packs + prefills
        the full multimodal prompt; later turns extend the resident KV with
        only [uncommitted tail + template glue + question] tokens."""
        from .batching import Request

        if self._closed:
            raise RuntimeError("session is closed")
        cfg = self.p.cfg
        mnt = max_new_tokens or self.max_new_tokens
        self._turn += 1

        if self._turn == 1:
            embeds, amask, _ids = self.p.pack_prompt(
                self.frames, question, wav=self.wav,
                frame_seconds=self.frame_seconds, video_uid=self.video_uid,
            )
            valid = int(np.asarray(amask).sum())
            self._make_engine(embeds.shape[1])
            req = Request(
                embeds=embeds, attn_mask=amask, max_new_tokens=mnt,
                uid=("turn", 1), keep_prefix=self._key,
                temperature=self.temperature, top_k=self.top_k,
                top_p=self.top_p, seed=self.seed,
            )
        else:
            closed = self._last_tok in cfg.lm.eos_token_ids
            glue = follow_up_text(cfg, question, closed)
            new_ids = encode_plain(self.p.tok, glue)
            suffix = list(self._tail) + list(new_ids)
            Sb = int(np.ceil(len(suffix) / self.suffix_bucket) * self.suffix_bucket)
            padded = np.full((Sb,), cfg.lm.pad_token_id, np.int32)
            padded[: len(suffix)] = suffix
            se = np.asarray(self._embed_ids(padded))  # [1, Sb, H]
            L2 = self._kv_len + Sb
            if L2 + mnt > self.capacity:
                raise ValueError(
                    f"conversation ({L2} tokens) + max_new_tokens ({mnt}) "
                    f"exceeds session capacity {self.capacity}; open the "
                    "session with a larger `capacity`"
                )
            full = np.zeros((1, L2, se.shape[-1]), se.dtype)
            full[:, self._kv_len :] = se
            mask = np.zeros((1, L2), bool)
            mask[:, : self._kv_len + len(suffix)] = True
            valid = self._kv_len + len(suffix)
            req = Request(
                embeds=jnp.asarray(full), attn_mask=jnp.asarray(mask),
                max_new_tokens=mnt, uid=("turn", self._turn),
                prefix_key=self._key, prefix_len=self._kv_len,
                keep_prefix=self._key,
                temperature=self.temperature, top_k=self.top_k,
                top_p=self.top_p, seed=self.seed + self._turn - 1,
            )

        self._engine.submit(req)
        r = self._run(req)
        # committed generated tokens = kv_len - request valid length; the
        # rest (usually just the final/EOS token) re-feeds next turn
        committed = r.kv_len - valid
        assert 0 <= committed <= len(r.tokens), (r.kv_len, valid, len(r.tokens))
        self._tail = [int(t) for t in r.tokens[committed:]]
        self._kv_len = r.kv_len
        self._last_tok = int(r.tokens[-1])
        self.turn_tokens.append([int(t) for t in r.tokens])

        from ..eval.runner import _trim_generated

        text = self.p.tok.decode(_trim_generated(r.tokens, cfg.lm)).strip()
        self.history.append((question, text))
        return text

    def close(self):
        """Release the resident KV donor (reclaims the session's HBM)."""
        if self._engine is not None:
            self._engine.release_prefix(self._key)
        self._closed = True
