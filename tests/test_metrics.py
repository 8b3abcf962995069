"""Metric math tests (reference contract: evaluate/src/main.rs:121-192)."""

from vaporetto_tpu.metrics import char_metric, word_metric

WB, NWB = 1, 0


class TestCharMetric:
    def test_perfect(self):
        results = [([WB, NWB, WB], None, [WB, NWB, WB], None)]
        m = char_metric(results)
        assert (m.tp, m.tn, m.fp, m.fn) == (2, 1, 0, 0)
        assert m.precision == 1.0 and m.recall == 1.0 and m.f1 == 1.0

    def test_confusion(self):
        # ref:  WB NWB WB NWB
        # sys:  WB WB  NWB NWB
        results = [([WB, NWB, WB, NWB], None, [WB, WB, NWB, NWB], None)]
        m = char_metric(results)
        assert (m.tp, m.tn, m.fp, m.fn) == (1, 1, 1, 1)
        assert m.precision == 0.5 and m.recall == 0.5


class TestWordMetric:
    def test_perfect_no_tags(self):
        # "ab c" -> boundaries [NWB, WB]; 2 words
        b = [NWB, WB]
        t = [[None], [None], [None]]
        m = word_metric([(b, t, b, t)])
        assert (m.n_sys, m.n_ref, m.n_cor) == (2, 2, 2)
        assert m.f1 == 1.0

    def test_word_mismatch(self):
        # ref "ab c" vs sys "a bc": ref [NWB, WB], sys [WB, NWB]
        t = [[None], [None], [None]]
        m = word_metric([([NWB, WB], t, [WB, NWB], t)])
        # no common words; ref has 2 words, sys has 2 words
        assert (m.n_sys, m.n_ref, m.n_cor) == (2, 2, 0)

    def test_tag_mismatch_makes_word_wrong(self):
        b = [NWB, WB]
        ref_t = [[None], ["名詞"], [None]]
        sys_t = [[None], ["動詞"], [None]]
        m = word_metric([(b, ref_t, b, sys_t)])
        # boundaries all match: 2 words each; first word's tag differs
        assert (m.n_sys, m.n_ref, m.n_cor) == (2, 2, 1)
