"""Text tokenizers/encoders for task conditioning (reference
src/data/utils/text_processing.py — Octo extras kept for capability
parity; the π0 path tokenizes through VLAProcessor instead).

`HFTokenizerProcessor` covers the reference's HFTokenizer (optionally
embedding with a Flax model); MUSE/CLIP variants need tf-hub / hub access
and raise a clear error when unavailable."""

from __future__ import annotations

from typing import Optional, Sequence


class TextProcessor:
    def encode(self, strings: Sequence[str]):
        raise NotImplementedError


class HFTokenizerProcessor(TextProcessor):
    def __init__(
        self,
        tokenizer_name: str,
        tokenizer_kwargs: Optional[dict] = None,
        encode_with_model: bool = False,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)
        self.tokenizer_kwargs = tokenizer_kwargs or {
            "max_length": 64,
            "padding": "max_length",
            "truncation": True,
            "return_tensors": "np",
        }
        self.model = None
        if encode_with_model:
            from transformers import FlaxAutoModel

            self.model = FlaxAutoModel.from_pretrained(tokenizer_name)

    def encode(self, strings: Sequence[str]):
        import numpy as np

        inputs = self.tokenizer(list(strings), **self.tokenizer_kwargs)
        if self.model is not None:
            return np.asarray(self.model(**inputs).last_hidden_state)
        return dict(inputs)


class MuseEmbedding(TextProcessor):
    """Universal Sentence Encoder (needs tensorflow_hub + network)."""

    def __init__(self):
        try:
            import tensorflow_hub as hub
            import tensorflow_text  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError("MuseEmbedding requires tensorflow_hub/_text") from e
        self.model = hub.load(
            "https://tfhub.dev/google/universal-sentence-encoder-multilingual/3"
        )

    def encode(self, strings: Sequence[str]):
        import numpy as np
        import tensorflow as tf

        with tf.device("/cpu:0"):
            return np.asarray(self.model(list(strings)))


class CLIPTextProcessor(TextProcessor):
    def __init__(self, model_name: str = "openai/clip-vit-base-patch32"):
        from transformers import CLIPProcessor

        self.processor = CLIPProcessor.from_pretrained(model_name)

    def encode(self, strings: Sequence[str]):
        out = self.processor(text=list(strings), return_tensors="np", padding=True)
        out["position_ids"] = None
        return dict(out)
