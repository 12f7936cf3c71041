"""Trainer tests: freeze policy, per-module LR groups, LoRA deltas,
save/restore, and a short sharded training run that must reduce the loss."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.constants import IGNORE_INDEX
from tdc_video_tpu.model import init_tdc
from tdc_video_tpu.train import lora as lora_lib
from tdc_video_tpu.train.trainer import TrainConfig, Trainer, trainable_mask
from tdc_video_tpu.train.dataset import modality_grouped_order, uniform_sample


def _batch(cfg, B=2, T=4, L=24, key=0):
    rng = np.random.default_rng(key)
    s, d = cfg.siglip.image_size, cfg.dino.image_size
    labels = np.full((B, L), IGNORE_INDEX, np.int32)
    labels[:, 10:] = rng.integers(2, 100, (B, L - 10))
    return {
        "input_ids": np.asarray(rng.integers(2, 100, (B, L)), np.int32),
        "labels": labels,
        "image_pos": np.full((B,), 5, np.int32),
        "text_len": np.full((B,), L, np.int32),
        "has_image": np.ones((B,), bool),
        "siglip_px": rng.normal(0, 1, (B, T, s, s, 3)).astype(np.float32),
        "dino_px": rng.normal(0, 1, (B, T, d, d, 3)).astype(np.float32),
        "frame_mask": np.ones((B, T), bool),
        "qformer_text_ids": rng.integers(1, 50, (B, 6)).astype(np.int32),
        "qformer_text_mask": np.ones((B, 6), bool),
    }


class TestFreezePolicy:
    def test_default_stage2(self):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        mask = trainable_mask(params, TrainConfig())
        assert not any(jax.tree_util.tree_leaves(mask["siglip"]))
        assert not any(jax.tree_util.tree_leaves(mask["dino"]))
        assert all(jax.tree_util.tree_leaves(mask["lm"]))
        assert all(jax.tree_util.tree_leaves(mask["compressor"]))

    def test_adapter_only(self):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        mask = trainable_mask(params, TrainConfig(tune_mm_mlp_adapter=True))
        assert not any(jax.tree_util.tree_leaves(mask["lm"]))
        assert all(jax.tree_util.tree_leaves(mask["sva"]))


class TestLoRA:
    def test_init_and_apply(self):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        lora = lora_lib.init_lora(jax.random.PRNGKey(1), params["lm"], rank=4)
        assert any("q_proj" in k for k in lora)
        # B = 0 -> apply_lora is identity at init
        merged = lora_lib.apply_lora(params["lm"], lora, alpha=8, rank=4)
        w0 = params["lm"]["layers"]["q_proj"]["w"]
        np.testing.assert_allclose(np.asarray(merged["layers"]["q_proj"]["w"]), np.asarray(w0))
        # nonzero B shifts the weight by a@b * alpha/rank
        k = "layers/q_proj/w"
        lora[k] = dict(lora[k], b=jnp.ones_like(lora[k]["b"]))
        merged = lora_lib.apply_lora(params["lm"], lora, alpha=8, rank=4)
        delta = np.einsum("...ir,...ro->...io", np.asarray(lora[k]["a"]), np.ones_like(lora[k]["b"])) * 2.0
        np.testing.assert_allclose(
            np.asarray(merged["layers"]["q_proj"]["w"]), np.asarray(w0) + delta, rtol=1e-5
        )


class TestLoRAGraft:
    """graft_lora (runtime y = xW + (xA)B, the train-step form) must be
    numerically interchangeable with apply_lora (merged weights) — forward
    logits AND gradients w.r.t. the A/B leaves."""

    def _setup(self):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)["lm"]
        lora = lora_lib.init_lora(jax.random.PRNGKey(1), params, rank=4)
        # nonzero B everywhere so the delta actually participates
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.03 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora
        )
        ids = jnp.asarray(np.random.default_rng(0).integers(2, 100, (2, 12)), jnp.int32)
        return cfg.lm, params, lora, ids

    def test_forward_parity(self):
        from tdc_video_tpu.models import lm as lm_mod

        lmcfg, params, lora, ids = self._setup()
        merged = lora_lib.apply_lora(params, lora, alpha=8, rank=4)
        grafted = lora_lib.graft_lora(params, lora, alpha=8, rank=4)
        a = lm_mod.lm_forward(lmcfg, merged, input_ids=ids, dtype=jnp.float32)
        b = lm_mod.lm_forward(lmcfg, grafted, input_ids=ids, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def test_grad_parity_and_caller_tree_untouched(self):
        from tdc_video_tpu.models import lm as lm_mod

        lmcfg, params, lora, ids = self._setup()

        def loss_merged(l):
            p = lora_lib.apply_lora(params, l, alpha=8, rank=4)
            return lm_mod.lm_forward(lmcfg, p, input_ids=ids, dtype=jnp.float32).sum()

        def loss_grafted(l):
            p = lora_lib.graft_lora(params, l, alpha=8, rank=4)
            return lm_mod.lm_forward(lmcfg, p, input_ids=ids, dtype=jnp.float32).sum()

        gm = jax.grad(loss_merged)(lora)
        gg = jax.grad(loss_grafted)(lora)
        total = 0.0
        for k in lora:
            for ab in ("a", "b"):
                np.testing.assert_allclose(
                    np.asarray(gm[k][ab]), np.asarray(gg[k][ab]), rtol=2e-4, atol=2e-4
                )
                total += float(np.abs(np.asarray(gg[k][ab])).sum())
        assert total > 0.0  # gradients actually flow through the graft
        # grafting must not mutate the caller's param tree
        assert "lora_a" not in params["layers"]["q_proj"]


class TestDatasetUtils:
    def test_uniform_sample(self):
        frames = np.arange(10)[:, None]
        kept, bitmap = uniform_sample(frames, 4)
        assert len(kept) == 4 and bitmap.sum() == 4
        assert bitmap[0] == 1

    def test_modality_grouped_order(self):
        lengths = [5, 100, 7, 90, 6, 95]
        modality = [False, True, False, True, False, True]
        order = modality_grouped_order(lengths, modality, batch_size=2, seed=0)
        assert sorted(order) == list(range(6))
        # full batches are modality-pure; the ragged tail batch may mix
        for i in range(0, 4, 2):
            a, b = order[i], order[i + 1]
            assert modality[a] == modality[b]


@pytest.mark.slow
class TestTrainerRuns:
    def test_loss_decreases_and_freeze_respected(self, tmp_path):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            learning_rate=5e-3,
            gradient_accumulation_steps=1,
            model_max_length=128,
            max_visual_len=64,
            save_steps=1000,
            logging_steps=1,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=6)
        sig0 = np.asarray(
            jax.tree_util.tree_leaves(tr.params["siglip"])[0]
        ).copy()
        batch = _batch(cfg)
        losses = [tr.train_step(batch) for _ in range(6)]
        assert losses[-1] < losses[0], losses
        # frozen tower unchanged
        sig1 = np.asarray(jax.tree_util.tree_leaves(tr.params["siglip"])[0])
        np.testing.assert_array_equal(sig0, sig1)
        tr.log({"loss": losses[-1]})
        assert os.path.exists(tmp_path / "metrics.jsonl")

    def test_save_restore(self, tmp_path):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            model_max_length=128,
            max_visual_len=64,
            gradient_accumulation_steps=1,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=4)
        tr.train_step(_batch(cfg))
        tr.save()
        w_after = np.asarray(tr.params["image_newline"])

        tr2 = Trainer(cfg, tcfg, init_tdc(jax.random.PRNGKey(9), cfg), total_steps=4)
        assert tr2.restore_if_available()
        assert tr2.step == 1
        np.testing.assert_array_equal(np.asarray(tr2.params["image_newline"]), w_after)

    def test_async_save_overlaps_and_restores(self, tmp_path):
        """save(wait=False) returns before the disk write completes but the
        next step's buffer donation is safe (Orbax copies to host
        synchronously); a later blocking save() makes both durable."""
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            model_max_length=128,
            max_visual_len=64,
            gradient_accumulation_steps=1,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=4)
        tr.train_step(_batch(cfg))
        tr.save(wait=False)
        tr.train_step(_batch(cfg))  # donates while the async write runs
        tr.save()
        w_after = np.asarray(tr.params["image_newline"])

        tr2 = Trainer(cfg, tcfg, init_tdc(jax.random.PRNGKey(9), cfg), total_steps=4)
        assert tr2.restore_if_available()
        assert tr2.step == 2
        np.testing.assert_array_equal(np.asarray(tr2.params["image_newline"]), w_after)

    def test_lora_training_updates_only_lora(self, tmp_path):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            learning_rate=1e-3,
            lora_enable=True,
            lora_r=4,
            lora_alpha=8,
            gradient_accumulation_steps=1,
            model_max_length=128,
            max_visual_len=64,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=3)
        lm_w0 = np.asarray(tr.params["lm"]["layers"]["q_proj"]["w"]).copy()
        b0 = np.asarray(tr.lora["layers/q_proj/w"]["b"]).copy()
        for _ in range(2):
            loss = tr.train_step(_batch(cfg))
        assert np.isfinite(loss)
        # base LM untouched; lora B moved off zero
        np.testing.assert_array_equal(
            lm_w0, np.asarray(tr.params["lm"]["layers"]["q_proj"]["w"])
        )
        assert np.abs(np.asarray(tr.lora["layers/q_proj/w"]["b"]) - b0).max() > 0
        merged = tr.export_merged()
        assert not np.array_equal(
            np.asarray(merged["lm"]["layers"]["q_proj"]["w"]), lm_w0
        )

    def test_lora_respects_freeze_flags(self, tmp_path):
        """Regression (ADVICE r1): lora_enable=True with
        unfreeze_mm_compressor=False must keep the compressor frozen."""
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            learning_rate=1e-3,
            lora_enable=True,
            lora_r=4,
            lora_alpha=8,
            unfreeze_mm_compressor=False,
            gradient_accumulation_steps=1,
            model_max_length=128,
            max_visual_len=64,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=3)
        comp0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tr.params["compressor"])]
        sva0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tr.params["sva"])]
        for _ in range(2):  # step 0 is inside warmup (lr=0)
            loss = tr.train_step(_batch(cfg))
        assert np.isfinite(loss)
        for before, after in zip(comp0, jax.tree_util.tree_leaves(tr.params["compressor"])):
            np.testing.assert_array_equal(before, np.asarray(after))
        # sva still trains (some leaf moves)
        moved = any(
            np.abs(np.asarray(after) - before).max() > 0
            for before, after in zip(sva0, jax.tree_util.tree_leaves(tr.params["sva"]))
        )
        assert moved


@pytest.mark.slow
def test_audio_in_graph_training(tmp_path):
    """Stage-3 shape: raw audio windows in the batch must flow through BEATs
    inside the train step and produce gradients for audio_proj."""
    cfg = tdc_tiny(audio=True)
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    B, T, L = 2, 8, 24
    batch = _batch(cfg, B=B, T=T, L=L)
    rng = np.random.default_rng(5)
    W = 2
    S = W * 10
    batch.update(
        audio_windows=rng.normal(0, 0.05, (B, W, 160000)).astype(np.float32),
        audio_wmask=np.ones((B, W, 160000), bool),
        audio_frame_of_sec=np.clip(np.arange(S) // 2, 0, T - 1)[None].repeat(B, 0).astype(np.int32),
        audio_group_pos=(np.arange(S) % 2)[None].repeat(B, 0).astype(np.int32),
        audio_group_size=np.full((B, T), 2, np.int32),
        audio_sec_valid=np.ones((B, S), bool),
    )
    from tdc_video_tpu.model import tdc_loss
    import jax.numpy as jnp

    def loss_of_audio_proj(ap):
        pp = dict(params)
        pp["audio_proj"] = ap
        return tdc_loss(cfg, pp, batch, max_len=512, max_visual_len=400, remat=False)

    loss, g = jax.value_and_grad(loss_of_audio_proj)(params["audio_proj"])
    assert np.isfinite(float(loss))
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert gn > 0, "no gradient reached audio_proj through the in-graph audio path"


class TestFrozenGradClip:
    def test_frozen_grads_do_not_inflate_clip(self):
        """clip_by_global_norm must see only trainable gradients: a huge
        gradient on a frozen leaf (towers are frozen by default) must not
        shrink the trainable update (the reference clips over
        requires_grad params only)."""
        import optax

        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.model import init_tdc
        from tdc_video_tpu.train.trainer import TrainConfig, build_optimizer

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(grad_clip=1.0)
        tx, mask = build_optimizer(params, tcfg, total_steps=10)
        state = tx.init(params)

        grads_small = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 1e-3), params
        )
        # same gradients, plus an enormous gradient on every FROZEN leaf
        grads_poison = jax.tree_util.tree_map(
            lambda g, t: g if t else jnp.full_like(g, 1e6), grads_small, mask
        )
        up_clean, _ = tx.update(grads_small, state, params)
        up_poison, _ = tx.update(grads_poison, tx.init(params), params)
        clean = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda u, t: u if t else None, up_clean, mask)
        )
        poison = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda u, t: u if t else None, up_poison, mask)
        )
        for a, b in zip(clean, poison):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
        # frozen leaves still receive zero updates
        frozen = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda u, t: None if t else u, up_poison, mask)
        )
        for f in frozen:
            assert float(jnp.abs(f).max()) == 0.0


class TestPrefetchFit:
    def test_fit_overlaps_and_logs(self, tmp_path):
        """fit() drives the prefetch-thread input pipeline to completion and
        logs deferred (device-resident) losses at logging_steps."""
        from tdc_video_tpu.config import tdc_tiny

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            max_steps=3,
            logging_steps=1,
            save_steps=100,
            gradient_accumulation_steps=1,
            model_max_length=128,
            max_visual_len=64,
            report_to="jsonl",
            prefetch_batches=2,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=3)
        produced = []

        def gen():
            for i in range(10):  # more than max_steps: fit must stop at 3
                produced.append(i)
                yield _batch(cfg)

        tr.fit(gen())
        assert tr.step == 3
        import json as _json

        lines = [
            _json.loads(l)
            for l in open(tmp_path / "metrics.jsonl")
            if l.strip()
        ]
        assert len(lines) >= 3
        assert all(np.isfinite(l["loss"]) for l in lines)
        # the prefetch thread ran ahead of the consumed steps (bounded buffer)
        assert len(produced) >= 3

    def test_fit_propagates_pipeline_errors(self, tmp_path):
        from tdc_video_tpu.config import tdc_tiny

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            max_steps=10,
            save_steps=100,
            gradient_accumulation_steps=1,
            model_max_length=128,
            max_visual_len=64,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=10)

        def gen():
            yield _batch(cfg)
            raise RuntimeError("corrupt shard")

        with pytest.raises(RuntimeError, match="corrupt shard"):
            tr.fit(gen())


class TestQuantizedFrozenBase:
    """QLoRA-style stage-3: the FROZEN base stored as weight-only int8
    (TrainConfig.quantize_frozen="int8") with full-precision LoRA deltas
    riding on it at matmul time (models/layers.linear "w_q"+"lora_a").
    This is what fits the stage-3 reference shape on one 16 GB v5e chip:
    the bf16 base + optimizer state alone is 14.6 GB of arguments
    (XLA memory dump, PERF.md round 5)."""

    def test_linear_int8_lora_exact_decomposition(self):
        from tdc_video_tpu.models.layers import linear
        from tdc_video_tpu.models.quant import quantize_linear_int8

        rng = np.random.default_rng(0)
        p = {"w": jnp.asarray(rng.normal(0, 0.1, (16, 24)), jnp.float32)}
        q = quantize_linear_int8(p)
        q["lora_a"] = jnp.asarray(rng.normal(0, 0.1, (16, 4)), jnp.float32)
        q["lora_b"] = jnp.asarray(rng.normal(0, 0.1, (4, 24)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (3, 16)), jnp.float32)
        base = linear({"w_q": q["w_q"], "w_scale": q["w_scale"]}, x)
        delta = (x @ q["lora_a"]) @ q["lora_b"]
        np.testing.assert_allclose(
            np.asarray(linear(q, x)), np.asarray(base + delta), rtol=1e-5, atol=1e-5
        )
        # gradients w.r.t. A/B match the float-base formula: the int8 weight
        # is a constant, so d/dA (x@A)@B is independent of the base repr
        def s(ab, base_p):
            pp = dict(base_p, lora_a=ab["a"], lora_b=ab["b"])
            return linear(pp, x).sum()

        ab = {"a": q["lora_a"], "b": q["lora_b"]}
        g_int8 = jax.grad(s)(ab, {"w_q": q["w_q"], "w_scale": q["w_scale"]})
        from tdc_video_tpu.models.quant import dequantize_linear

        g_float = jax.grad(s)(ab, dequantize_linear(q))
        np.testing.assert_allclose(
            np.asarray(g_int8["a"]), np.asarray(g_float["a"]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_int8["b"]), np.asarray(g_float["b"]), rtol=1e-5, atol=1e-6
        )

    def test_trainer_int8_frozen_trains_and_exports_float(self, tmp_path):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(
            output_dir=str(tmp_path),
            learning_rate=1e-2,
            warmup_ratio=0.0,
            lora_enable=True,
            lora_r=4,
            lora_alpha=8,
            quantize_frozen="int8",
            gradient_accumulation_steps=1,
            model_max_length=128,
            max_visual_len=64,
            loss_chunk=32,
        )
        tr = Trainer(cfg, tcfg, params, total_steps=4)
        # the resident base is int8 (LM projections + fully-frozen towers)
        assert tr.params["lm"]["layers"]["q_proj"]["w_q"].dtype == jnp.int8
        assert tr.params["siglip"]["layers"]["q_proj"]["w_q"].dtype == jnp.int8
        wq0 = np.asarray(tr.params["lm"]["layers"]["q_proj"]["w_q"]).copy()
        batch = _batch(cfg)
        losses = [float(tr.train_step(batch)) for _ in range(4)]
        assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0] - 1e-3  # learning through the int8 base
        np.testing.assert_array_equal(
            wq0, np.asarray(tr.params["lm"]["layers"]["q_proj"]["w_q"])
        )
        assert np.abs(np.asarray(tr.lora["layers/q_proj/w"]["b"])).max() > 0
        # export: dequantized float tree with the deltas baked in
        merged = tr.export_merged()
        assert all(
            v.dtype != jnp.int8 for v in jax.tree_util.tree_leaves(merged)
        )
        from tdc_video_tpu.models.quant import dequantize_linear

        deq = dequantize_linear(
            tr.params["lm"]["layers"]["q_proj"], dtype=cfg.param_dtype
        )["w"]
        assert not np.array_equal(
            np.asarray(merged["lm"]["layers"]["q_proj"]["w"]), np.asarray(deq)
        )  # lora delta present

    def test_quantize_frozen_requires_lora(self, tmp_path):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="lora"):
            Trainer(
                cfg,
                TrainConfig(output_dir=str(tmp_path), quantize_frozen="int8"),
                params,
                total_steps=2,
            )


class TestEncodeRemat:
    """remat_encode (model.py): checkpointing the SVA aggregator, the audio
    encoder and the segment+compress stage must not change the loss value or
    the gradients — it only trades backward-pass memory for recompute
    (the saved Q-Former/SVA internals are ~7 GB at stage-1 shapes,
    PERF.md round 5)."""

    def test_loss_and_grad_identity(self):
        from tdc_video_tpu.model import tdc_loss

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        batch = {k: jnp.asarray(v) for k, v in _batch(cfg).items()}

        def loss(p, remat):
            return tdc_loss(
                cfg, p, batch, max_len=48, max_visual_len=24, remat=remat
            )

        v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        checked = 0
        for path, leaf in flat0:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat1[path]), rtol=2e-4, atol=2e-5,
                err_msg=str(path),
            )
            checked += 1
        assert checked > 10
