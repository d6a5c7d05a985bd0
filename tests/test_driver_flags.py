"""Driver CLI flag wiring (no data, no device work): monkeypatch the data
stack out of train.py / evaluate.py and assert flags actually reach the
components they document — VERDICT r4 found ``--num_workers`` parsed but
never consumed (the reference honors it, its train.py:186-189 and
evaluate.py:262-265)."""
import pytest


class _Sentinel(Exception):
    """Abort main() right after the code under test has run."""


def _train_args(tmp_path, extra=()):
    return [
        "--adjacent_range", "5", "10",
        "--id_range", "1", "2",
        "--input_size", "32", "32",
        "--batch_size", "8",
        "--num_iter", "2",
        "--number_epoch", "0",
        "--training_patient_id", "1",
        "--testing_patient_id", "1",
        "--validation_patient_id", "1",
        "--training_result_root", str(tmp_path / "results"),
        "--training_data_root", str(tmp_path / "data"),
        *extra,
    ]


def _patch_train_data_stack(monkeypatch, train_cli, loader_factory):
    monkeypatch.setattr(train_cli, "SfMDataset", lambda **kw: object())
    monkeypatch.setattr(train_cli, "BatchLoader", loader_factory)
    monkeypatch.setattr(train_cli.readers, "get_color_file_names_by_bag",
                        lambda *a, **k: ([], [], []))
    monkeypatch.setattr(train_cli.readers, "get_parent_folder_names",
                        lambda *a, **k: [])


def test_train_num_workers_reaches_loader(monkeypatch, tmp_path):
    import train as train_cli

    seen = []

    def recording_loader(dataset, batch_size, **kw):
        seen.append(kw.get("num_workers"))
        if len(seen) == 2:  # train + validation loaders both constructed
            raise _Sentinel
        return object()

    _patch_train_data_stack(monkeypatch, train_cli, recording_loader)
    with pytest.raises(_Sentinel):
        train_cli.main(_train_args(tmp_path, ["--num_workers", "3"]))
    assert seen == [3, 3]


def test_evaluate_num_workers_reaches_loader(monkeypatch, tmp_path):
    import evaluate as eval_cli

    seen = []

    def recording_loader(dataset, batch_size, **kw):
        seen.append(kw.get("num_workers"))
        raise _Sentinel

    monkeypatch.setattr(eval_cli, "SfMDataset", lambda **kw: object())
    monkeypatch.setattr(eval_cli, "BatchLoader", recording_loader)
    monkeypatch.setattr(eval_cli.readers, "get_filenames_from_frame_indexes",
                        lambda *a, **k: [])
    monkeypatch.setattr(eval_cli.readers, "get_parent_folder_names",
                        lambda *a, **k: [])
    with pytest.raises(_Sentinel):
        eval_cli.main([
            "--input_size", "32", "32",
            "--adjacent_range", "5", "10",
            "--id_range", "1", "2",
            "--selected_frame_index_list", "1", "2",
            "--trained_model_path", str(tmp_path / "nope"),
            "--sequence_root", str(tmp_path),
            "--evaluation_result_root", str(tmp_path / "results"),
            "--evaluation_data_root", str(tmp_path),
            "--phase", "validation",
            "--num_workers", "5",
        ])
    assert seen == [5]


def test_train_grad_accum_divisibility_error(monkeypatch, tmp_path):
    """--grad_accum that does not divide the per-device batch is rejected
    at startup (ADVICE r4: otherwise the row-strided microbatch reshape
    silently reshards every microbatch and devices idle)."""
    import train as train_cli

    _patch_train_data_stack(monkeypatch, train_cli,
                            lambda *a, **kw: object())
    monkeypatch.setattr(train_cli.training, "create_train_state",
                        lambda *a, **k: object())
    # 8 CPU devices (conftest) x batch 8 -> per-device 1, grad_accum 2
    with pytest.raises(ValueError, match="grad_accum"):
        train_cli.main(_train_args(tmp_path, ["--grad_accum", "2"]))
