"""Docs build check: every ```python snippet in docs/*.md must execute
(the reference ships Sphinx docs built in CI, .circleci/config.yml; here
the markdown pages themselves are the contract and this test is the
build)."""
import re
from pathlib import Path

import pytest

DOCS = sorted((Path(__file__).parent.parent / "docs").glob("*.md"))
assert DOCS, "docs/ pages missing"

_BLOCK = re.compile(r"```python\n(.*?)```", re.S)


def _snippets():
    for page in DOCS:
        for i, m in enumerate(_BLOCK.finditer(page.read_text())):
            yield pytest.param(m.group(1), id=f"{page.stem}-{i}")


@pytest.mark.parametrize("code", _snippets())
def test_doc_snippet_runs(code):
    exec(compile(code, "<doc snippet>", "exec"), {"__name__": "__doc_snippet__"})
