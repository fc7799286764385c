"""Generated-API-docs sync gate.

``docs/api/*.md`` is generated from live docstrings by ``docs/gen_api.py``
(the role mkdocstrings plays in the reference's docs build,
``mkdocs.yml`` + ``docs/api/*`` upstream). This test regenerates the pages
in memory and fails if the committed files drifted — the same "docs always
match docstrings" guarantee, enforced in CI instead of at site-build time.
"""

from __future__ import annotations

import os
import sys

_DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")


def test_api_pages_in_sync():
    sys.path.insert(0, _DOCS)
    try:
        import gen_api
    finally:
        sys.path.remove(_DOCS)

    pages = gen_api.build_pages()
    assert pages, "generator produced no pages"

    missing, stale = [], []
    for name, body in pages.items():
        path = os.path.join(gen_api.OUT_DIR, name)
        if not os.path.isfile(path):
            missing.append(name)
            continue
        with open(path) as f:
            if f.read() != body:
                stale.append(name)

    orphans = sorted(set(os.listdir(gen_api.OUT_DIR)) - set(pages))
    assert not (missing or stale or orphans), (
        f"docs/api out of sync — regenerate with `make docs-api`. "
        f"missing={missing} stale={stale} orphans={orphans}"
    )
