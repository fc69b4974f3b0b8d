"""API input validation (reference logic/schema.py:58-67 — mandatory
non-empty id, boolean force; validation-failure matrix analog of
logic/test_action.py:193-200) and the optional codec-library probe for
multimodal decode (PIL/soundfile picked up when importable, deterministic
fallback otherwise)."""

from __future__ import annotations

import numpy as np
import pytest

from ckanext_extractor_spark.api import ExtractorEngine, ValidationError
from ckanext_extractor_spark.corpus import corpus_pdf


@pytest.fixture(scope="module")
def built_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("valid") / "idx")
    eng = ExtractorEngine(spark, root, n_buckets=8, salt_threshold=50,
                          store_content=True)
    eng.extract(spark.createDataFrame(corpus_pdf(20)), build_id="v1")
    return eng


def test_extract_rejects_bad_args(spark, built_engine):
    corpus = spark.createDataFrame(corpus_pdf(5))
    with pytest.raises(ValidationError):
        built_engine.extract(corpus, force="maybe")  # boolean_validator
    with pytest.raises(ValidationError):
        built_engine.extract(corpus, build_id="")
    with pytest.raises(ValidationError):
        built_engine.extract(corpus, build_id=123)


def test_delete_rejects_bad_ids(built_engine):
    for bad in ([], None, "7", [1, "x"], [True], 5):
        with pytest.raises(ValidationError):
            built_engine.delete(bad)


def test_show_rejects_non_int(built_engine):
    for bad in ("1", None, True, 1.5):
        with pytest.raises(ValidationError):
            built_engine.show(bad)


def test_search_rejects_bad_args(built_engine):
    with pytest.raises(ValidationError):
        built_engine.search("")
    with pytest.raises(ValidationError):
        built_engine.search("   ")
    with pytest.raises(ValidationError):
        built_engine.search(None)
    with pytest.raises(ValidationError):
        built_engine.search("data", k=0)
    with pytest.raises(ValidationError):
        built_engine.search("data", k=True)
    with pytest.raises(ValidationError):
        built_engine.search("data", mode="fastest")
    with pytest.raises(ValidationError):
        built_engine.search("data", conjunctive="yes")
    with pytest.raises(ValidationError):
        built_engine.phrase_search("", k=5)
    with pytest.raises(ValidationError):
        built_engine.snippets("data", k=-1)
    # valid calls still work after all the rejects
    assert built_engine.search("data value", k=3)


def test_validation_error_is_value_error():
    assert issubclass(ValidationError, ValueError)


# ---------------------------------------------------------------------------
# multimodal codec-library probe
# ---------------------------------------------------------------------------

def test_decode_pil_probe_consistent():
    """When PIL is importable, _decode_pil decodes a real PNG; when not,
    it returns None and the deterministic fallback stays in charge —
    both branches are legal, and which one runs depends on the container."""
    from ckanext_extractor_spark.functions import multimodal as mm

    if mm._PIL_Image is None:
        assert mm._decode_pil(b"\x89PNG\r\n\x1a\nnotreal") is None
        # fallback still yields deterministic shape-correct dims
        w1 = mm._decode_image(b"payload-a")
        w2 = mm._decode_image(b"payload-a")
        assert w1 == w2
    else:
        import io

        im = mm._PIL_Image.new("L", (32, 17), color=128)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        got = mm._decode_pil(buf.getvalue())
        assert got is not None
        w, h, gray = got
        assert (w, h) == (32, 17)
        assert gray.shape == (17, 32)
        assert np.allclose(gray, 128.0)


def test_decode_soundfile_probe_consistent():
    from ckanext_extractor_spark.functions import multimodal as mm

    if mm._soundfile is None:
        assert mm._decode_soundfile(b"not audio") is None
    else:
        import io

        buf = io.BytesIO()
        data = np.zeros(800, dtype=np.float32)
        mm._soundfile.write(buf, data, 8000, format="WAV")
        got = mm._decode_soundfile(buf.getvalue())
        assert got == (800, 8000)


# ---------------------------------------------------------------------------
# index-derived snippet anchors
# ---------------------------------------------------------------------------

def test_snippet_anchor_from_index_positions(spark, tmp_path):
    """The snippet window anchors at the ANALYZED term's index position,
    not the first raw substring hit — 'data' inside 'metadata' must not
    capture the window."""
    import pandas as pd

    decoy = "metadata " * 20  # 180 chars of substring-match decoys
    rows = [
        {"repo": "r", "path": "a.txt", "commit": "c1", "lang": "en",
         "content": decoy + "data end marker"},
        {"repo": "r", "path": "b.txt", "commit": "c1", "lang": "en",
         "content": "unrelated filler text value stream"},
    ]
    eng = ExtractorEngine(spark, str(tmp_path / "snipidx"), n_buckets=8,
                          salt_threshold=50, store_content=True)
    eng.extract(spark.createDataFrame(pd.DataFrame(rows)), build_id="s1")
    snips = eng.snippets("data", k=1)
    assert len(snips) == 1
    assert "data end" in snips[0][2], snips[0][2]


def test_char_of_position_matches_expansion_counts(spark, tmp_path):
    """Identifier splitting gives 'mergeSort' TWO index positions (merge@0,
    sort@1, with the catenated mergesort stacked at 1); position 2 must
    map to the char offset of 'data'."""
    eng = ExtractorEngine(spark, str(tmp_path / "cpos"), n_buckets=8)
    text = "mergeSort data"
    from ckanext_extractor_spark.analysis.tokenizer import _expand_word

    n0 = _expand_word("mergeSort", eng.analyzer)[2]
    assert n0 == 2
    assert eng._char_of_position(text, n0) == text.index("data")
    assert eng._char_of_position(text, 0) == 0
    # past-the-end position degrades to the head
    assert eng._char_of_position(text, 99) == 0
