"""TDC-Video TPU: multimodal long-video understanding with Temporal Dynamic
Context compression, built TPU-first on JAX/XLA/Pallas.

Public surface:
    config          — dataclass config tree (tdc_qwen2_7b / tdc_llama32_3b / tdc_tiny)
    model           — init_tdc, prepare_multimodal_inputs, tdc_loss, encode_*
    builder         — load_pretrained_model (reference checkpoints + LoRA)
    serving.generate / serving.streaming
    train           — Trainer, TrainConfig, stage presets, run CLI
    eval            — TDCPredictor + 7 benchmark harnesses
"""

from . import config, constants

__version__ = "0.1.0"
