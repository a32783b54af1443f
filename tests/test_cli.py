"""CLI argument surface + distributed helpers."""

import numpy as np
import pytest

from robust_speech_analysis_framework_tpu.cli import main
from robust_speech_analysis_framework_tpu.parallel.distributed import (
    initialize_distributed,
    shard_file_list,
)


def test_cli_requires_command(capsys):
    with pytest.raises(SystemExit):
        main([])


def test_cli_help_lists_subcommands(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("extract", "svm", "cnnlstm", "predict", "bench"):
        assert cmd in out


def test_cli_extract_on_synthetic_corpus(tmp_path, capsys):
    import struct
    import wave

    hc = tmp_path / "c" / "Reading-Task" / "audio" / "HC"
    hc.mkdir(parents=True)
    (tmp_path / "c" / "Interview-Task" / "audio_clip").mkdir(parents=True)
    with wave.open(str(hc / "01_CF30_1.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        t = np.arange(16000) / 16000
        x = (0.3 * np.sin(2 * np.pi * 150 * t) * 32767).astype("<i2")
        w.writeframes(struct.pack(f"<{len(x)}h", *x))
    (tmp_path / "c" / "fold-lists.csv").write_text("b,,\nfold1,fold1.1\n,\n")
    rc = main(
        ["extract", "--corpus", str(tmp_path / "c"), "--out",
         str(tmp_path / "out"), "--features", "mshds", "--quiet"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "features_mshds_reading_task.csv" in out


def test_initialize_distributed_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False


def test_shard_file_list_single_process():
    paths = [f"f{i}" for i in range(10)]
    assert shard_file_list(paths) == paths
