"""Native C++ reader: parity with the pure-Python codec + speed sanity."""
import time

import numpy as np
import pytest

from e2e_asr_tpu.data import native
from e2e_asr_tpu.data.speech import load_files
from e2e_asr_tpu.data.synth import write_speech_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    path = str(d / "train_1k.0.0001.tfrecord")
    write_speech_corpus(path, 50, feat_length=16, min_tokens=4, max_tokens=10)
    return path


def test_native_available():
    assert native.available(), "libtfrec.so failed to build/load"


def test_native_matches_python(corpus):
    py = load_files([corpus], 16, use_native=False)
    nat = load_files([corpus], 16, use_native=True)
    assert len(py) == len(nat) == 50
    for a, b in zip(py, nat):
        assert a.utt_id == b.utt_id
        np.testing.assert_allclose(a.logmel, b.logmel, rtol=1e-6)
        np.testing.assert_array_equal(a.char, b.char)
        np.testing.assert_array_equal(a.phone, b.phone)


def test_native_is_faster(corpus):
    t0 = time.perf_counter()
    load_files([corpus], 16, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_files([corpus], 16, use_native=True)
    t_nat = time.perf_counter() - t0
    # Native should beat the Python codec comfortably; assert a loose 3x to
    # stay robust on loaded CI machines.
    assert t_nat * 3 < t_py, (t_nat, t_py)


def test_native_handles_missing_file():
    assert native.load_speech_file("/nonexistent/file.tfrecord", 16) is None
