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


# ---------------------------------------------------------------------------
# batch-vectorized postings kernel ≡ per-doc doc_term_stats loop
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.tokenizer import doc_term_stats
from search_engine_spark.operators.index_build import _tokenize_map_vec

_VEC_CFG = EngineConfig(index_partitions=2)


def _refmodel_batch(pdf, cfg):
    terms, doc_ids, tfs, dls, poss = [], [], [], [], []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        stats = list(doc_term_stats(text or "", cfg))
        doc_len = sum(tf for _, tf, _ in stats)
        for term, tf, positions in stats:
            terms.append(term)
            doc_ids.append(doc_id)
            tfs.append(tf)
            dls.append(doc_len)
            poss.append(positions)
    return pd.DataFrame(
        {
            "term": pd.array(terms, dtype=object),
            "doc_id": np.array(doc_ids, dtype=np.int64),
            "tf": np.array(tfs, dtype=np.int32),
            "doc_len": np.array(dls, dtype=np.int64),
            "positions": pd.array(poss, dtype=object),
        }
    )


def _canon_postings(df):
    df = df.copy()
    df["positions"] = df["positions"].map(
        lambda p: tuple(int(x) for x in p)
    )
    df["doc_len"] = df["doc_len"].astype(np.int64)
    return df.sort_values(["doc_id", "term"]).reset_index(drop=True)


def _assert_vec_identical(texts, cfg=_VEC_CFG):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": pd.array(texts, dtype=object),
        }
    )
    ref = _refmodel_batch(pdf, cfg)
    out = list(_tokenize_map_vec(cfg)([pdf]))
    vec = (
        pd.concat(out, ignore_index=True)
        if out
        else ref.iloc[0:0]
    )
    pd.testing.assert_frame_equal(_canon_postings(ref), _canon_postings(vec))


def test_vec_kernel_adversarial_batches():
    # exercises both fast branches: with and without oversized runs
    _assert_vec_identical(
        [
            "",
            None,
            "и в на по это same same same words",
            "x" * 300 + " ok " + "y" * 55,
            "z" * 51 + " " + "w" * 50 + " " + "v" * 102 + " " + "u" * 103,
            "многи́е русские слова и ещё слова",
            "a bb ccc dddd " * 40,
            "tab\tsep\nnewline  double  space!punct,comma",
            "ONE one OnE",
            "и в на",  # stopword-only doc
        ]
    )
    _assert_vec_identical(  # no oversized run → simple-regex branch
        ["normal words here a x y", "и в на", "same same diff"]
    )
    _assert_vec_identical(["", None])  # empty batch short-circuit


def test_vec_kernel_general_config_path():
    # remove_numbers routes through tokenize_bytes (general path)
    cfg = EngineConfig(index_partitions=2, remove_numbers=True)
    _assert_vec_identical(
        ["abc123 def 45 6789x", "x1 22 три4ри"], cfg=cfg
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab xy.!\tи в\nсло" + "L" * 3,
            max_size=120,
        ),
        max_size=8,
    )
)
def test_vec_kernel_property_identity(texts):
    _assert_vec_identical(texts)


def test_vec_kernel_lo_zero_no_empty_tokens():
    # lo=0 must behave as lo=1 on BOTH paths: a run of exactly seg (51)
    # bytes has an empty tail, which is never emitted
    cfg = EngineConfig(index_partitions=2, min_token_bytes=0)
    from search_engine_spark.functions.tokenizer import tokenize_text

    assert tokenize_text("y" * 51, cfg) == ["y" * 51]
    _assert_vec_identical(["y" * 51, "a bb", "y" * 102], cfg=cfg)


def test_vec_kernel_mixed_oversize_batch():
    # oversized runs in SOME docs must not change other docs' tokens
    # (per-doc regex choice), and sub-lo tokens survive only where lo
    # allows
    _assert_vec_identical(
        ["short one", "L" * 200 + " tail", "another short x y"]
    )
