"""Protein-stack numerical parity vs the ACTUAL reference models.

Extends the codon-LM transplant proof (``tests/test_torch_parity.py``) to
the protein family: the reference's ``ProteinConditionalTransformer``,
``ProteinClassifier``, and ``MultiTaskProteinClassifier``
(``src/protein_lm/models.py``, ``models_multi.py``) are instantiated from
the mounted checkout, their weights transplanted through the documented
layout map (``utils/torch_bridge.py`` protein_* functions — torch's packed
``in_proj_weight`` QKV rows → separate q/k/v linears), and this repo's
functional forwards must reproduce their outputs:

- causal LM logits (post-LN encoder stack + final LN + untied head),
- bidirectional BOS-representation classifier logits under padding masks,
- multi-task critic logits for mean AND attention pooling, plus the
  ``extract_latent`` bottleneck the EBM consumes.

Skipped when torch or the reference checkout is unavailable.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy cross-framework suite

from genomics_lm_tpu.utils import torch_bridge

if not torch_bridge.reference_available():  # pragma: no cover
    pytest.skip(
        "reference checkout or torch unavailable", allow_module_level=True
    )

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genomics_lm_tpu.models import protein as jp  # noqa: E402

_REF = str(torch_bridge.reference_root())
if _REF not in sys.path:
    sys.path.insert(0, _REF)

from src.protein_lm.config import (  # noqa: E402
    ProteinClassifierConfig as TorchClsConfig,
    ProteinLMConfig as TorchLMConfig,
)
from src.protein_lm.models import (  # noqa: E402
    ProteinClassifier as TorchClassifier,
    ProteinConditionalTransformer as TorchLM,
)
from src.protein_lm.models_multi import (  # noqa: E402
    MultiTaskProteinClassifier as TorchMulti,
)

DIMS = dict(vocab_size=28, n_layer=2, n_head=4, n_embd=64, block_size=48,
            dropout=0.0)
ATOL = 2e-4


def _tokens(batch=3, pad_tail=True):
    rng = np.random.default_rng(7)
    ids = rng.integers(3, 24, (batch, DIMS["block_size"])).astype(np.int64)
    ids[:, 0] = 1  # BOS
    if pad_tail:
        for row, n_pad in enumerate((0, 5, 17)[:batch]):
            if n_pad:
                ids[row, -n_pad:] = 0
    return ids


class TestProteinLMParity:
    def test_causal_lm_logits_match(self):
        torch.manual_seed(11)
        ref = TorchLM(TorchLMConfig(**DIMS)).eval()
        params = torch_bridge.protein_lm_torch_to_jax(
            ref.state_dict(), DIMS["n_layer"]
        )
        ids = _tokens(pad_tail=False)
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(ids)).numpy()
        mine = np.asarray(jp.protein_lm_forward(
            params, jp.ProteinLMConfig(**DIMS), jnp.asarray(ids)
        ))
        np.testing.assert_allclose(mine, ref_logits, atol=ATOL, rtol=0)


class TestProteinClassifierParity:
    def test_bos_classifier_logits_match_with_padding(self):
        torch.manual_seed(12)
        cfg_kw = dict(DIMS, num_classes=7)
        ref = TorchClassifier(TorchClsConfig(**cfg_kw)).eval()
        params = torch_bridge.protein_classifier_torch_to_jax(
            ref.state_dict(), DIMS["n_layer"]
        )
        ids = _tokens()
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(ids)).numpy()
        mine = np.asarray(jp.classifier_forward(
            params, jp.ProteinClassifierConfig(**cfg_kw), jnp.asarray(ids)
        ))
        np.testing.assert_allclose(mine, ref_logits, atol=ATOL, rtol=0)


class TestMultiTaskCriticParity:
    TASKS = {"family": 5, "function": 3, "stability": 1}

    def _pair(self, pooling):
        torch.manual_seed(13)
        cfg_kw = dict(DIMS, num_classes=5, pooling=pooling, bidirectional=True)
        ref = TorchMulti(TorchClsConfig(**cfg_kw), dict(self.TASKS)).eval()
        params = torch_bridge.protein_multitask_torch_to_jax(
            ref.state_dict(), DIMS["n_layer"], list(self.TASKS)
        )
        return ref, params, jp.ProteinClassifierConfig(**cfg_kw)

    @pytest.mark.parametrize("pooling", ["mean", "attention"])
    def test_task_logits_match(self, pooling):
        ref, params, cfg = self._pair(pooling)
        ids = _tokens()
        mask = (ids != 0).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(ids),
                          attention_mask=torch.from_numpy(mask))
        mine = jp.multitask_forward(params, cfg, jnp.asarray(ids),
                                    attention_mask=jnp.asarray(mask))
        for task in self.TASKS:
            np.testing.assert_allclose(
                np.asarray(mine[task]), ref_out[task].numpy(),
                atol=ATOL, rtol=0, err_msg=f"task {task} ({pooling})",
            )

    def test_extract_latent_matches(self):
        """The bottleneck z the EBM trains on must agree too."""
        ref, params, cfg = self._pair("attention")
        ids = _tokens()
        mask = (ids != 0).astype(np.float32)
        with torch.no_grad():
            ref_z = ref.extract_latent(
                torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
            ).numpy()
        mine = np.asarray(jp.extract_latent(
            params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
        ))
        np.testing.assert_allclose(mine, ref_z, atol=ATOL, rtol=0)
