import numpy as np

from gci_tpu.score import compute_n50, gci_score


def test_n50_basic():
    assert compute_n50([]) == 0
    assert compute_n50([10]) == 10
    assert compute_n50([1, 1, 1, 7]) == 7
    assert compute_n50([5, 5]) == 5
    # cumulative >= half-total picks the first qualifying (largest-first)
    assert compute_n50([3, 3, 3, 3]) == 3
    assert compute_n50([8, 4, 2, 1]) == 8


def test_n50_matches_numpy_cumsum_semantics(rng):
    for _ in range(50):
        lengths = rng.integers(1, 10_000, size=int(rng.integers(1, 30))).tolist()
        srt = sorted(lengths, reverse=True)
        cum = np.cumsum(srt)
        want = 0
        for i, number in enumerate(cum):
            if number >= cum[-1] / 2:
                want = srt[i]
                break
        assert compute_n50(lengths) == want


def test_gci_score_zero_contigs_is_int_zero():
    v = gci_score(100, 50, 1, 0)
    assert v == 0 and isinstance(v, int)


def test_gci_score_formula():
    # 100 * log2(obs_n50/exp_n50 + 1) / log2(obs_ctg/exp_ctg + 1)
    from math import log2

    v = gci_score(45027022, 266013, 1, 65)
    assert v == round(100 * log2(266013 / 45027022 + 1) / log2(65 / 1 + 1), 4)
    assert v == 0.1406  # Chr01_MH63 golden row (example/MH63.gci)
    assert gci_score(31921180, 259735, 12, 850) == 0.1896  # Genome golden row
