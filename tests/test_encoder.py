"""DSS encoder parity tests against golden outputs of the reference binary
(reseek -convert -feature_fasta on test_data/q100.bca)."""

import os

import pytest

from tests.conftest import GOLDEN, load_fasta
from reseek_tpu.encoder.dss import feature_string, mu_kmers

INT_FEATURES = ["SS", "SS3", "NENSS", "NENSS3", "Conf", "NENConf",
                "NormDens4", "NENDist4", "RENDist4", "AA3", "AA4"]


@pytest.mark.parametrize("feature", INT_FEATURES)
def test_int_feature_parity(q100_encodings, feature):
    golden = load_fasta(os.path.join(GOLDEN, f"q100.{feature}.fa"))
    for label, enc in q100_encodings.items():
        assert feature_string(enc, feature) == golden[label], label


def test_mu_letter_parity(q100_encodings):
    golden = load_fasta(os.path.join(GOLDEN, "q100.mu.fa"))
    for label, enc in q100_encodings.items():
        assert feature_string(enc, "Mu") == golden[label], label


def test_mu_letters_in_range(q100_encodings):
    for enc in q100_encodings.values():
        assert enc.mu_letters.max() < 36


def test_mu_kmers():
    import numpy as np
    lets = np.array([1, 2, 3, 4, 5], np.uint8)
    k = mu_kmers(lets, "111")
    assert list(k) == [1 * 36 * 36 + 2 * 36 + 3,
                       2 * 36 * 36 + 3 * 36 + 4,
                       3 * 36 * 36 + 4 * 36 + 5]


def test_profile_shape(q100_encodings):
    from reseek_tpu.constants import DSSParams
    p = DSSParams.create("sensitive")
    enc = next(iter(q100_encodings.values()))
    prof = enc.profile(p)
    assert prof.shape == (8, len(enc.chain))
    assert prof.max() < 31


def test_native_encoder_parity(q100_chains):
    from reseek_tpu.encoder import native
    from reseek_tpu.encoder.dss import _encode_chain_numpy, encode_chain
    if not native.available():
        import pytest
        pytest.skip("no native encoder (g++ unavailable)")
    import numpy as np
    for c in q100_chains[:25]:
        nat = encode_chain(c, use_native=True)
        ref = _encode_chain_numpy(c)
        for f, vals in ref.features.items():
            assert np.array_equal(nat.features[f], vals), (c.label, f)
