"""TPU-native serving: continuous-batching generation engine.

No reference equivalent — the reference serves one interactive request at
a time with a full O(T²) re-forward per token (``scripts/query_model.py``,
``generate.py:13-27``). This package keeps a fixed pool of batch slots
decoding in lockstep over one static-shape KV cache; finished sequences
free their slot and waiting requests are admitted mid-flight, so the chip
always steps a full batch regardless of per-request lengths.
"""

from genomics_lm_tpu.serving.engine import (
    Request,
    RequestResult,
    ServingEngine,
    init_serving_state,
    serve_steps,
)
from genomics_lm_tpu.serving.speculative import (
    fit_bigram_table,
    generate_tokens_speculative,
    serve_steps_speculative,
    speculative_generate,
)


def __getattr__(name):
    # lazy: http.server import only when the front-end is actually used
    if name == "InferenceServer":
        from genomics_lm_tpu.serving.server import InferenceServer

        return InferenceServer
    raise AttributeError(name)


__all__ = [
    "InferenceServer",
    "Request",
    "RequestResult",
    "ServingEngine",
    "fit_bigram_table",
    "generate_tokens_speculative",
    "init_serving_state",
    "serve_steps",
    "serve_steps_speculative",
    "speculative_generate",
]
