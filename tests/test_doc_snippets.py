"""Execute every ```python block in docs/Documentation.md.

Reference counterpart: ``test/doc_snippets/*.cpp`` — the reference
compiles and runs each tutorial code block; we exec them.
"""

import pathlib
import re

import pytest

DOC = pathlib.Path(__file__).parent.parent / "docs" / "Documentation.md"
BLOCKS = re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)


def test_doc_has_snippets():
    assert len(BLOCKS) >= 6


@pytest.mark.parametrize(
    "idx", range(len(BLOCKS)),
    ids=[f"snippet{i}" for i in range(len(BLOCKS))],
)
def test_doc_snippet_runs(idx):
    exec(compile(BLOCKS[idx], f"doc-snippet-{idx}", "exec"), {})
