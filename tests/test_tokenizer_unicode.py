"""Property test: our stdlib-re word splitter == the regex-module pattern
HF's CLIPTokenizer actually uses (VERDICT round 1, item 6).

The comparison target is built directly from the third-party ``regex``
module with the verbatim HF pattern — fully non-circular.  Corpus: >1k mixed
strings covering CJK, Cyrillic, Arabic, Greek, Devanagari, combining marks,
non-decimal numerals, emoji, punctuation runs, and random codepoint soup.
"""

import random

import pytest

regex = pytest.importorskip("regex")

from sdmatte_tpu.models.tokenizer import _split_words, _whitespace_clean

# the verbatim HF CLIPTokenizer pattern (transformers
# models/clip/tokenization_clip.py)
HF_PAT = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)

SAMPLES = [
    "a photo of a cat",
    "trés jolie café naïve",
    "日本語のテキストです",
    "中文分词测试一二三",
    "Привет мир, как дела?",
    "مرحبا بالعالم",
    "Γειά σου κόσμε",
    "नमस्ते दुनिया",
    "한국어 텍스트",
    "étude française",          # combining acute / cedilla
    "x́̂̃ stacked marks",
    "Ⅻ chapters and ² squared and ½ half",  # Nl / No numerals
    "١٢٣ arabic-indic digits ٤٥",
    "emoji 🎉🚀 and 🧑‍🎨 zwj sequence",
    "under_score and snake_case_words",
    "it's we're they'll i'd you've I'm don't",
    "<|startoftext|>special<|endoftext|>",
    "mixed日本語and英語words",
    "a nbsp thin　ideographic spaces",
    "ⅰⅱⅲ roman and ㊂ circled and 〇 zero",
    "ß ẞ İ ı dotted and dotless",
    "ʿarabic ʾalif lam modifier letters",
    "ᚠᚡᚢ runes ᠀ mongolian ⵀ tifinagh",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math letters 𝟙𝟚𝟛 math digits",
    "𐍈 gothic 𐌰𐌱 and 𠀀 CJK ext-B",
]


def _random_strings(n=1000, seed=0):
    rng = random.Random(seed)
    pools = [
        (0x0020, 0x024F),    # latin + supplement
        (0x0370, 0x06FF),    # greek/cyrillic/arabic
        (0x0900, 0x0D7F),    # indic
        (0x1E00, 0x2BFF),    # extended latin, punct, numerals, symbols
        (0x3000, 0x30FF),    # CJK punct + kana
        (0x4E00, 0x4FFF),    # CJK
        (0x1F300, 0x1F6FF),  # emoji
    ]
    out = []
    for _ in range(n):
        lo, hi = rng.choice(pools)
        s = "".join(chr(rng.randint(lo, hi)) for _ in range(rng.randint(1, 24)))
        out.append(s)
    return out


@pytest.mark.parametrize("text", SAMPLES)
def test_curated_multilingual_split_parity(text):
    t = _whitespace_clean(text).lower()
    assert _split_words(t) == HF_PAT.findall(t)


def test_random_codepoint_soup_parity():
    mismatches = []
    for s in _random_strings(1200):
        t = _whitespace_clean(s).lower()
        ours, hf = _split_words(t), HF_PAT.findall(t)
        if ours != hf:
            mismatches.append((t, ours, hf))
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[0]}"
