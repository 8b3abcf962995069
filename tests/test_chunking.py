"""Halo-chunking exactness tests (SURVEY.md §5 long-context row).

Chunked prediction must produce bit-identical scores, boundaries, and
match-state caches vs whole-line prediction — the correctness proof of the
sequence-parallel layout.
"""

import numpy as np
import pytest

from vaporetto_tpu.parallel.chunking import influence_radius, predict_long
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence

from test_scorers import create_test_model


@pytest.fixture(scope="module")
def predictor():
    return Predictor(create_test_model(), True)


def long_text(n):
    base = "この人は地球人だ地球の人だこの地球は人だらけ"
    reps = n // len(base) + 1
    return (base * reps)[:n]


class TestChunking:
    @pytest.mark.parametrize("n,chunk", [(300, 64), (1000, 128), (513, 64)])
    def test_exact_vs_whole(self, predictor, n, chunk):
        text = long_text(n)
        whole = Sentence.from_raw(text)
        predictor.predict(whole)
        chunked = Sentence.from_raw(text)
        predict_long(predictor, chunked, chunk_size=chunk)
        assert chunked.boundary_scores_list() == whole.boundary_scores_list()
        assert np.array_equal(chunked.boundaries, whole.boundaries)
        assert np.array_equal(chunked.char_pma_states, whole.char_pma_states)
        assert np.array_equal(chunked.type_pma_states, whole.type_pma_states)

    def test_tags_after_chunked(self, predictor):
        text = long_text(400)
        whole = Sentence.from_raw(text)
        predictor.predict(whole)
        whole.fill_tags()
        chunked = Sentence.from_raw(text)
        predict_long(predictor, chunked, chunk_size=96)
        chunked.fill_tags()
        assert chunked.write_tokenized_text() == whole.write_tokenized_text()

    def test_short_input_passthrough(self, predictor):
        s = Sentence.from_raw("この人は地球人だ")
        predict_long(predictor, s, chunk_size=4096)
        assert s.boundary_scores_list() == [-22, 54, 58, 43, -54, 68, 48]

    def test_influence_radius(self, predictor):
        r = influence_radius(predictor.compiled)
        assert r >= 3  # at least the window size
