"""Tokenizer parity tests (SURVEY.md §5.2-1, FIXTURES.md §2).

Byte-level cases pinned against the as-implemented reference semantics
(cpp_modules/tokenizer/src/tokenizer.cpp).
"""

from search_engine_spark.functions.stemmer import stem_text_token
from search_engine_spark.functions.tokenizer import (
    RUSSIAN_STOPWORDS,
    tokenize_bytes_with_offsets,
    tokenize_text,
)


def test_report_worked_example_preserves_cyrillic_case():
    # report/main.tex:437-441 documents intent (all-lowercase), but the
    # as-implemented ASCII-only fold preserves the leading capital М.
    text = "Машинное обучение - это раздел искусственного интеллекта!"
    # NB: "это" is NOT in the reference's 150-word stopword list
    # (tokenizer.cpp:17-39 has этот/этого/этом/эти… but not это)
    assert tokenize_text(text) == [
        "Машинное", "обучение", "это", "раздел", "искусственного", "интеллекта",
    ]


def test_ascii_lowercase_only():
    assert tokenize_text("Hello WORLD Привет") == ["hello", "world", "Привет"]


def test_punct_are_delimiters_including_apostrophe_hyphen():
    # ' and - are delimiters (tokenizer.h:32-44); the normalize "keep
    # inner '/-" branch is unreachable in the doc path.
    assert tokenize_text("don't well-known a_b") == ["don", "well", "known"]
    # _ is punctuation (91-96 range) → delimiter
    assert tokenize_text("x_y") == []  # "x" and "y" both 1 byte < min 2


def test_min_2_bytes_max_50_bytes():
    # "ю" is 2 UTF-8 bytes → passes min ("я" would be stopword-filtered)
    assert tokenize_text("a bb ю") == ["bb", "ю"]
    tok49, tok50, tok51 = "x" * 49, "y" * 50, "z" * 51
    assert tokenize_text(tok49) == [tok49]
    assert tokenize_text(tok50) == [tok50]
    # 51-byte run: flushed at 51 bytes (overflow skips the max check)
    assert tokenize_text(tok51) == [tok51]


def test_overflow_segmentation():
    run = "a" * 60
    assert tokenize_text(run) == ["a" * 51, "a" * 9]
    run = "b" * 102
    assert tokenize_text(run) == ["b" * 51, "b" * 51]
    run = "c" * 52  # remainder of 1 byte dropped
    assert tokenize_text(run) == ["c" * 51]


def test_stopwords_case_sensitive_cyrillic():
    assert tokenize_text("и в не что") == []
    # Capitalized Cyrillic stopword is NOT filtered (ASCII-only folding)
    assert tokenize_text("И пример") == ["И", "пример"]
    assert len(RUSSIAN_STOPWORDS) == 150  # verified == the C++ initializer list


def test_digits_kept():
    assert tokenize_text("abc 123 a1b2") == ["abc", "123", "a1b2"]


def test_empty_and_punct_only():
    assert tokenize_text("") == []
    assert tokenize_text("   \t\n") == []
    assert tokenize_text("!!! ... ()[]") == []


def test_offsets_are_byte_offsets():
    toks = tokenize_bytes_with_offsets("ab  Привет cd".encode("utf-8"))
    # "ab" at 0, "Привет" at 4 (bytes), "cd" at 4+12+1=17
    assert toks == [(b"ab", 0), ("Привет".encode(), 4), (b"cd", 17)]


def test_stemmer_truncation_semantics():
    # stemmer.cpp:7-30 — byte truncation, outer guard size>5
    assert stem_text_token("ab") == "ab"
    assert stem_text_token("ABCDE") == "abcde"      # len 5: unchanged (lowered)
    assert stem_text_token("abcdef") == "abcde"     # len 6: drop 1
    assert stem_text_token("abcdefg") == "abcde"    # len 7: drop 2
    # Cyrillic: bytes, not chars — "бегущий" = 14 bytes → drop 2 bytes = 1 char
    assert stem_text_token("бегущий") == "бегущи"
