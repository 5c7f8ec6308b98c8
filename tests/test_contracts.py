"""Frozen primary-training contract validation."""

import json

import pytest

from genomics_lm_tpu.training.contracts import (
    COMMON_VALUES,
    DATASET_FREEZE_ID,
    DATASETS,
    RELEASE,
    SCHEMA_NAME,
    SCHEMA_VERSION,
    load_and_validate_primary_training_config,
    validate_primary_training_config,
)


def valid_pilot_config() -> dict:
    root = DATASETS["genome"]["root"]
    return {
        "primary_training_contract": {
            "schema": SCHEMA_NAME,
            "version": SCHEMA_VERSION,
            "release": RELEASE,
            "dataset_freeze_id": DATASET_FREEZE_ID,
            "role": "pilot",
            "protocol": "genome",
            "dataset_id": DATASETS["genome"]["dataset_id"],
        },
        "dataset_manifest": f"{root}/manifest.json",
        "itos_path": f"{root}/itos.txt",
        "train_npz": f"{root}/train_bs512.npz",
        "val_npz": f"{root}/val_bs512.npz",
        "test_npz": f"{root}/test_bs512.npz",
        "run_id": "corrected-codonlm-v1-pilot-genome-seed1337",
        "seed": 1337,
        "dataloader_seed": 1337,
        "epochs": 1,
        "max_time_minutes": 30,
        **COMMON_VALUES,
    }


class TestPrimaryContract:
    def test_valid_pilot_passes(self):
        result = validate_primary_training_config(valid_pilot_config())
        assert result["role"] == "pilot"
        assert result["protocol"] == "genome"
        assert result["dataset_id"] == DATASETS["genome"]["dataset_id"]

    def test_missing_contract_block(self):
        cfg = valid_pilot_config()
        del cfg["primary_training_contract"]
        with pytest.raises(ValueError, match="primary_training_contract"):
            validate_primary_training_config(cfg)

    def test_frozen_value_drift_rejected(self):
        cfg = valid_pilot_config()
        cfg["n_layer"] = 12
        with pytest.raises(ValueError, match="n_layer"):
            validate_primary_training_config(cfg)

    def test_undeclared_key_rejected(self):
        cfg = valid_pilot_config()
        cfg["surprise_flag"] = True
        with pytest.raises(ValueError, match="surprise_flag"):
            validate_primary_training_config(cfg)

    def test_wrong_dataset_id_rejected(self):
        cfg = valid_pilot_config()
        cfg["primary_training_contract"]["dataset_id"] = "deadbeef"
        with pytest.raises(ValueError, match="dataset_id"):
            validate_primary_training_config(cfg)

    def test_pilot_epochs_pinned(self):
        cfg = valid_pilot_config()
        cfg["epochs"] = 5
        with pytest.raises(ValueError, match="epochs"):
            validate_primary_training_config(cfg)

    def test_seed_allowlist(self):
        cfg = valid_pilot_config()
        cfg["seed"] = cfg["dataloader_seed"] = 7
        with pytest.raises(ValueError, match="seed"):
            validate_primary_training_config(cfg)

    def test_json_loader_preserves_float_exponents(self, tmp_path):
        # yaml.safe_load reads JSON's 3e-05 as a string (no dot before the
        # exponent); the loader must parse .json with the json module
        path = tmp_path / "cfg.json"
        path.write_text(json.dumps(valid_pilot_config()))
        result = load_and_validate_primary_training_config(path)
        assert result["run_id"] == "corrected-codonlm-v1-pilot-genome-seed1337"
