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


class TestEBMParity:
    def test_energy_matches(self):
        from src.protein_lm.ebm import ProteinLatentEBM as TorchEBM

        torch.manual_seed(14)
        ref = TorchEBM(n_embd=32, hidden_dim=48).eval()
        state = ref.state_dict()
        t = lambda k: np.asarray(state[k].detach(), dtype=np.float32)
        params = {
            "fc1": {"w": t("net.0.weight").T, "b": t("net.0.bias")},
            "fc2": {"w": t("net.3.weight").T, "b": t("net.3.bias")},
            "fc3": {"w": t("net.6.weight").T, "b": t("net.6.bias")},
        }
        z = np.random.default_rng(2).normal(size=(5, 32)).astype(np.float32)
        with torch.no_grad():
            ref_e = ref(torch.from_numpy(z)).numpy()
        mine = np.asarray(jp.ebm_energy(params, jnp.asarray(z)))
        np.testing.assert_allclose(mine, ref_e, atol=ATOL, rtol=0)
        # the 3-D mean-pool path too
        z3 = np.random.default_rng(3).normal(size=(2, 7, 32)).astype(np.float32)
        with torch.no_grad():
            ref_e3 = ref(torch.from_numpy(z3)).numpy()
        np.testing.assert_allclose(
            np.asarray(jp.ebm_energy(params, jnp.asarray(z3))), ref_e3,
            atol=ATOL, rtol=0)


class TestBiophysicsEncoderParity:
    def test_cnn_encoder_matches(self):
        """Reference NucleotideEncoder (1D CNN, stride-3 codon alignment)
        transplanted into the repo's conv path. The reference module
        imports scripts.probe_structural_awareness at module scope (used
        only by its data generator, not the encoder); satisfy it with
        this repo's parity implementation of the same pentamer tables."""
        import types

        if "scripts.probe_structural_awareness" not in sys.modules:
            from genomics_lm_tpu.models.biophysics import get_theoretical_shape

            stub = types.ModuleType("scripts.probe_structural_awareness")
            stub.get_theoretical_shape = get_theoretical_shape
            sys.modules["scripts.probe_structural_awareness"] = stub
        import importlib.util as ilu
        from pathlib import Path

        path = Path(_REF) / "src" / "codonlm" / "biophysics.py"
        spec = ilu.spec_from_file_location("_ref_biophysics", path)
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)

        from genomics_lm_tpu.models import biophysics as jb

        torch.manual_seed(15)
        ref = mod.NucleotideEncoder(d_shape=3).eval()
        state = ref.state_dict()
        t = lambda k: np.asarray(state[k].detach(), dtype=np.float32)
        params = {
            "conv1": {"w": t("net.0.weight"), "b": t("net.0.bias")},
            "conv2": {"w": t("net.2.weight"), "b": t("net.2.bias")},
        }
        one_hot = np.zeros((2, 30, 4), np.float32)
        rng = np.random.default_rng(4)
        for b in range(2):
            one_hot[b, np.arange(30), rng.integers(0, 4, 30)] = 1.0
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(one_hot)).numpy()
        mine = np.asarray(jb.encode(params, jnp.asarray(one_hot)))
        np.testing.assert_allclose(mine, ref_out, atol=ATOL, rtol=0)
