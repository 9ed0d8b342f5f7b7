"""IO tests: CSV parsing (native + fallback), recorders, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu import native
from ssme_tpu.io import (
    MessageWriter, ParamSampler, SampleWriter, read_data, timestamped_path,
)
from ssme_tpu.io.recording import MESSAGE_HEADER


def test_read_data_basic(tmp_path):
    # reference fixture semantics: test/test_data.csv is "1.23, 4.56"
    p = tmp_path / "d.csv"
    p.write_text("1.23, 4.56\n")
    arr = read_data(str(p))
    assert arr.shape == (1, 2)
    np.testing.assert_allclose(arr, [[1.23, 4.56]], rtol=1e-6)


def test_read_data_multirow_and_ragged(tmp_path, capfd):
    p = tmp_path / "d.csv"
    p.write_text("1.0,2.0\n3.0,4.0\nbad,row\n5.0,6.0\n")
    arr = read_data(str(p))
    np.testing.assert_allclose(arr, [[1, 2], [3, 4], [5, 6]])
    err = capfd.readouterr().err
    assert "line" in err or "row" in err  # log-and-continue (utils.h:37)


def test_read_data_wrong_cols_raises(tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("1.0,2.0\n")
    with pytest.raises(ValueError):
        read_data(str(p), num_cols=3)


def test_native_library_builds_and_matches_python(tmp_path):
    # the native C++ reader must be available in the dev environment and
    # agree with the fallback parser
    assert native.native_available(), "native csv_io library failed to build"
    p = tmp_path / "big.csv"
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 3)).astype(np.float32)
    p.write_text("\n".join(",".join(f"{v:.6f}" for v in row)
                           for row in data) + "\n")
    got = native.native_read_csv(str(p))
    assert got is not None and got.shape == (500, 3)
    np.testing.assert_allclose(got, data, atol=1e-5)


def test_param_sampler(tmp_path):
    p = tmp_path / "s.csv"
    p.write_text("".join(f"{i}.0,1.0\n" for i in range(10)))
    ps = ParamSampler(str(p), dim_param=2)
    draws = ps.samp(jax.random.key(0), num=200)
    assert draws.shape == (200, 2)
    firsts = np.asarray(draws[:, 0])
    assert set(np.unique(firsts)) <= set(float(i) for i in range(10))
    assert len(np.unique(firsts)) > 3  # actually random


def test_timestamped_path_format():
    import datetime
    t = datetime.datetime(2026, 8, 17, 5, 4, 3)
    assert timestamped_path("samples", t) == "samples_2026-08-17.05-04-03"


def test_sample_and_message_writers(tmp_path):
    sp = str(tmp_path / "samples.csv")
    mp = str(tmp_path / "messages.csv")
    with SampleWriter(sp, print_every_k=2, timestamp=False) as sw:
        sw.record(0, np.array([1.0, 2.0, 3.0]))
        sw.record(1, np.array([9.0, 9.0, 9.0]))  # decimated out
        sw.record(2, np.array([4.0, 5.0, 6.0]))
    rows = open(sp).read().strip().split("\n")
    assert len(rows) == 2
    assert [float(v) for v in rows[0].split(",")] == [1.0, 2.0, 3.0]

    with MessageWriter(mp, timestamp=False) as mw:
        mw.record(0, 0.0, -10.0, -11.0, -1.0, -2.0, -0.5, False)
        mw.record(1, 0.5, -10.0, -9.0, -1.0, -0.9, 0.2, True)
    lines = open(mp).read().split("\n")
    assert lines[0] + "\n" == MESSAGE_HEADER
    assert lines[1].startswith("1, 0.0, -10.0, -11.0")
    assert lines[2].endswith(", 1")  # accepted flag


def test_stream_writer_native_path(tmp_path):
    p = str(tmp_path / "stream.txt")
    w = native.StreamWriter(p)
    for i in range(100):
        w.write(f"line{i}\n")
    w.flush()
    w.close()
    lines = open(p).read().strip().split("\n")
    assert lines == [f"line{i}" for i in range(100)]
