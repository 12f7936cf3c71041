"""Model-wide constants.

Mirrors the reference constant surface (/root/reference/tdc/constants.py:7-13) so
datasets, collators and eval harnesses interoperate with reference-formatted data.
"""

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"

# End-of-text ids used to locate the text span when budgeting visual tokens
# (reference: tdc/cambrian_arch.py:753-757 keys on 151643 for qwen, 128002 for llama).
QWEN_PAD_ID = 151643
LLAMA_PAD_ID = 128002

# Audio framing: BEATs emits ~50 tokens per second of 16 kHz audio
# (reference: tdc/cambrian_arch.py:1549-1564).
AUDIO_SAMPLE_RATE = 16000
AUDIO_TOKENS_PER_SECOND = 50
AUDIO_WINDOW_SECONDS = 10
