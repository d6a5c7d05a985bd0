"""End-to-end smoke: train a few steps on bag_1 through the real CLI, write
a checkpoint, then run both evaluate phases against it — the full user
workflow (reference README.md:52-57) on the fixture sequence."""
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_root(fixture_seq, tmp_path_factory):
    """Copy of the fixture sequence (the reference tree is read-only and
    the precompute cache writes next to the data)."""
    root = tmp_path_factory.mktemp("e2e_data")
    dst = root / "bag_1" / fixture_seq.name
    shutil.copytree(fixture_seq, dst)
    return root


@pytest.fixture(scope="module")
def result_root(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e_results")


@pytest.fixture(scope="module")
def trained_run(data_root, result_root):
    import train as train_cli
    train_cli.main([
        "--adjacent_range", "5", "10",
        "--id_range", "1", "2",
        "--input_size", "256", "320",
        "--batch_size", "2",
        "--num_iter", "6",
        "--number_epoch", "0",
        "--validation_interval", "1",
        "--display_interval", "2",
        "--training_patient_id", "1",
        "--testing_patient_id", "1",
        "--validation_patient_id", "1",
        "--training_result_root", str(result_root),
        "--training_data_root", str(data_root),
        "--num_pre_workers", "1",
        "--compute_dtype", "float32",
        "--log_interval", "1",
        "--architecture_summary",
    ])
    runs = list(result_root.glob("depth_estimation_train_run_*"))
    assert runs, "training run directory missing"
    return runs[0]


def test_train_writes_checkpoint_and_scalars(trained_run):
    checkpoints = list(trained_run.glob("checkpoint_model_epoch_*"))
    assert checkpoints, "no checkpoint written"
    assert (trained_run / "scalars.jsonl").exists()
    scalars = (trained_run / "scalars.jsonl").read_text().strip().splitlines()
    assert len(scalars) >= 2
    assert list(trained_run.glob("all_scalars_*.json"))
    # the reference writes a training image board every display_interval
    # iterations (train.py:353-371 there) and one per validation display
    assert list(trained_run.glob("Training_Images_Results_*.png")), \
        "no in-training image panel written"
    assert list(trained_run.glob("Validation_Images_Results_*.png"))


def test_evaluate_test_phase(trained_run, data_root, result_root, fixture_seq):
    import evaluate as eval_cli
    checkpoint = sorted(trained_run.glob("checkpoint_model_epoch_*"))[-1]
    seq = data_root / "bag_1" / fixture_seq.name
    eval_cli.main([
        "--input_size", "256", "320",
        "--adjacent_range", "5", "10",
        "--id_range", "1", "2",
        "--selected_frame_index_list", "4584", "4609",
        "--trained_model_path", str(checkpoint),
        "--sequence_root", str(seq),
        "--evaluation_result_root", str(result_root / "test_phase"),
        "--evaluation_data_root", str(data_root),
        "--inlier_percentage", "0.99",
        "--load_intermediate_data",
        "--testing_patient_id", "1",
        "--phase", "test",
        "--num_pre_workers", "1",
        "--architecture_summary",
    ])
    out = list((result_root / "test_phase").glob("*/"))[0]
    plys = sorted(out.glob("*.ply"))
    pngs = sorted(out.glob("*.png"))
    assert len(plys) == 2 and len(pngs) == 2
    # the exported point cloud parses back and has sane content
    from endoscopydepthestimation_pytorch_tpu.utils.plyio import read_ply_vertices
    v = read_ply_vertices(plys[0])
    assert len(v) > 1000
    assert np.isfinite(v["z"]).all() and (v["z"] >= 0).all()


def test_evaluate_validation_phase(trained_run, data_root, result_root, fixture_seq):
    import evaluate as eval_cli
    checkpoint = sorted(trained_run.glob("checkpoint_model_epoch_*"))[-1]
    seq = data_root / "bag_1" / fixture_seq.name
    eval_cli.main([
        "--input_size", "256", "320",
        "--adjacent_range", "5", "10",
        "--id_range", "1", "2",
        "--selected_frame_index_list", "4584", "4597",
        "--trained_model_path", str(checkpoint),
        "--sequence_root", str(seq),
        "--evaluation_result_root", str(result_root / "val_phase"),
        "--evaluation_data_root", str(data_root),
        "--inlier_percentage", "0.99",
        "--load_intermediate_data",
        "--testing_patient_id", "1",
        "--phase", "validation",
        "--num_pre_workers", "1",
    ])
    out = list((result_root / "val_phase").glob("*/"))[0]
    assert (out / "0.png").exists() and (out / "0.ply").exists()
    assert (out / "metrics.json").exists()
    import json
    metrics = json.loads((out / "metrics.json").read_text())
    assert np.isfinite(metrics["abs_rel"])


def test_resume_from_checkpoint(trained_run, data_root):
    """Checkpoint restore round-trips params/step (reference train.py:214-227)."""
    import jax
    import jax.numpy as jnp
    from endoscopydepthestimation_pytorch_tpu import training
    from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
    from endoscopydepthestimation_pytorch_tpu.utils import checkpoint as ckpt

    checkpoint = sorted(trained_run.glob("checkpoint_model_epoch_*"))[-1]
    model = FCDenseNet57(n_classes=1)
    config = training.TrainConfig()
    state = training.create_train_state(model, jax.random.PRNGKey(1),
                                        (1, 256, 320, 3), config)
    fresh = jax.tree.map(np.asarray, state.params)
    state, epoch, validation = ckpt.load_any_checkpoint(checkpoint, state)
    assert epoch == 1
    assert int(state.step) > 0
    restored = jax.tree.map(np.asarray, state.params)
    diffs = [not np.allclose(a, b) for a, b in
             zip(jax.tree.leaves(fresh), jax.tree.leaves(restored))]
    assert any(diffs), "restored params identical to fresh init"
