"""Per-action authorization matrix (reference analog:
tests/logic/test_action.py:66-70,180-189,287-292,326-335 — User may
list/show but not extract/delete; Sysadmin may do everything)."""

from __future__ import annotations

import pandas as pd
import pytest

from ckanext_extractor_spark.api import ExtractorEngine
from ckanext_extractor_spark.auth import (
    AUTH_FUNCTIONS,
    NotAuthorized,
    check_access,
    register_auth_function,
)

USER = {"user": "alice", "sysadmin": False}
SYSADMIN = {"user": "root", "sysadmin": True}
ANON = {"user": None}


@pytest.mark.parametrize("ctx", [USER, ANON])
@pytest.mark.parametrize("action", ["extractor_extract", "extractor_delete",
                                    "extractor_compact"])
def test_mutations_denied_to_non_sysadmins(action, ctx):
    with pytest.raises(NotAuthorized):
        check_access(action, ctx)


@pytest.mark.parametrize("ctx", [USER, ANON, SYSADMIN])
@pytest.mark.parametrize("action", ["extractor_list", "extractor_show",
                                    "extractor_search",
                                    "extractor_phrase_search",
                                    "extractor_snippets"])
def test_reads_allowed_to_everybody(action, ctx):
    check_access(action, ctx)


@pytest.mark.parametrize("action", ["extractor_extract", "extractor_delete"])
def test_sysadmin_allowed_everything(action):
    check_access(action, SYSADMIN)


def test_trusted_library_mode_and_ignore_auth():
    check_access("extractor_delete", None)  # no context = trusted
    check_access("extractor_delete", {"user": "x", "ignore_auth": True})


def test_unknown_action_denied():
    with pytest.raises(NotAuthorized):
        check_access("extractor_frobnicate", USER)


def test_register_auth_function_override():
    def deny_list(context, data_dict=None):
        return {"success": False, "msg": "lists are private here"}

    orig = AUTH_FUNCTIONS["extractor_list"]
    try:
        register_auth_function("extractor_list", deny_list)
        with pytest.raises(NotAuthorized, match="lists are private"):
            check_access("extractor_list", USER)
        check_access("extractor_list", SYSADMIN)  # sysadmin still bypasses
    finally:
        register_auth_function("extractor_list", orig)


def test_engine_enforces_auth_context(spark, tmp_path):
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "repo": ["r"],
                "path": ["p"],
                "commit": ["c"],
                "lang": ["markdown"],
                "content": ["alpha beta"],
            }
        )
    )
    root = str(tmp_path / "authidx")
    admin_eng = ExtractorEngine(spark, root, n_buckets=8,
                                auth_context=SYSADMIN)
    admin_eng.extract(corpus, build_id="b1")

    # an engine re-opened on the built index with a non-sysadmin context
    user_eng = ExtractorEngine(spark, root, n_buckets=8, auth_context=USER)
    with pytest.raises(NotAuthorized):
        user_eng.extract(corpus, build_id="b2")
    with pytest.raises(NotAuthorized):
        user_eng.delete([1])
    with pytest.raises(NotAuthorized):
        user_eng.compact()

    # the non-sysadmin engine CAN read the index the sysadmin built
    assert user_eng.list_indexed().count() == 1
    hits = user_eng.search("alpha", k=5)
    assert len(hits) == 1
    assert user_eng.show(hits[0][0])["doc_id"] == hits[0][0]
