"""String (pre-)filters.

Reference: vaporetto_rules/src/string_filters/kytea_fullwidth.rs:13-118.
The mapping is KyTea's half-width -> full-width normalization table,
including the many-to-one prolonged-sound-mark folds
('－', '―', '─', '–' -> 'ー').

Implemented as a single ``str.translate`` table (C-speed) — the filter is
1-char-to-1-char, which downstream code relies on to map normalized
boundaries back onto the original text (predict CLI / tantivy analyzer).
"""

from __future__ import annotations

__all__ = ["KyteaFullwidthFilter", "FULLWIDTH_MAP"]

_PAIRS = {}
for _lo, _hi, _dst in (("a", "z", "ａ"), ("A", "Z", "Ａ"), ("0", "9", "０")):
    for _i in range(ord(_lo), ord(_hi) + 1):
        _PAIRS[chr(_i)] = chr(ord(_dst) + _i - ord(_lo))
_PAIRS.update({
    "(": "（", ")": "）", "{": "｛", "}": "｝", "<": "＜", ">": "＞",
    "｢": "「", "｣": "」", "[": "［", "]": "］", "-": "−", "～": "〜",
    ".": "。", "－": "ー", "/": "／", "_": "＿", ",": "，", "%": "％",
    "?": "？", "､": "、", "―": "ー", '"': "”", "'": "’", "･": "・",
    "─": "ー", "+": "＋", ":": "：", "–": "ー", "!": "！", "｡": "。",
    "&": "＆", "*": "＊", "@": "＠", "=": "＝",
})

FULLWIDTH_MAP = dict(_PAIRS)
_TABLE = str.maketrans(FULLWIDTH_MAP)


class KyteaFullwidthFilter:
    """Half-width to full-width filter, like KyTea's preprocessor."""

    def filter(self, string: str) -> str:
        return string.translate(_TABLE)
