"""Per-action authorization (reference analog: logic/auth.py:30-42).

The reference registers CKAN auth functions: ``extractor_delete`` and
``extractor_extract`` are sysadmin-only (``_only_sysadmins`` returns
success=False — CKAN grants sysadmins every action before consulting the
function), while ``extractor_list`` and ``extractor_show`` allow
anonymous access (``@auth_allow_anonymous_access`` + success=True).

Engine mapping: mutations (extract / delete / compact) are sysadmin-only;
reads (list / show / search / phrase / snippets / lineage) are
everybody.  A context is a plain dict like ``{"user": "alice",
"sysadmin": False}``; ``context=None`` is TRUSTED library mode — no
checks, the default for an engine embedded in a pipeline (the reference
has the same property: action functions called from plugin code pass
``ignore_auth``).  Like CKAN's IAuthFunctions, deployments can override
or add per-action functions via :func:`register_auth_function`.
"""

from __future__ import annotations

from typing import Callable


class NotAuthorized(PermissionError):
    """Raised by check_access when the context may not run the action
    (reference analog: ckan.logic.NotAuthorized)."""


def _only_sysadmins(context: dict, data_dict: dict | None = None) -> dict:
    # reference logic/auth.py:30-31 — non-sysadmins always denied; the
    # sysadmin bypass lives in check_access (as it does in CKAN core)
    return {"success": False}


def _everybody(context: dict, data_dict: dict | None = None) -> dict:
    # reference logic/auth.py:34-36 (@auth_allow_anonymous_access)
    return {"success": True}


AUTH_FUNCTIONS: dict[str, Callable[[dict, dict | None], dict]] = {
    # reference logic/auth.py:39-42
    "extractor_extract": _only_sysadmins,
    "extractor_delete": _only_sysadmins,
    "extractor_list": _everybody,
    "extractor_show": _everybody,
    # engine-native actions, same read/write split
    "extractor_compact": _only_sysadmins,
    "extractor_search": _everybody,
    "extractor_phrase_search": _everybody,
    "extractor_snippets": _everybody,
}


def register_auth_function(
    action: str, fn: Callable[[dict, dict | None], dict]
) -> None:
    """Override or add an auth function (IAuthFunctions analog,
    reference plugin.py get_auth_functions)."""
    AUTH_FUNCTIONS[action] = fn


def check_access(
    action: str, context: dict | None, data_dict: dict | None = None
) -> None:
    """Raise :class:`NotAuthorized` unless ``context`` may run
    ``action``.  ``context=None`` means trusted library mode (no auth).
    Sysadmin contexts are granted every action before the per-action
    function is consulted, matching CKAN core's dispatch."""
    if context is None or context.get("ignore_auth"):
        return
    if context.get("sysadmin"):
        return
    fn = AUTH_FUNCTIONS.get(action)
    if fn is None:
        raise NotAuthorized(f"unknown action {action!r}")
    result = fn(context, data_dict)
    if not result.get("success"):
        user = context.get("user") or "anonymous"
        raise NotAuthorized(
            result.get("msg", f"user {user!r} is not authorized to {action}")
        )
