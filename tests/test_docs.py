"""Docs cannot drift from the API: every complete ```python block in
docs/*.md is exec'd (sequentially per file, shared namespace).

Blocks tagged with a leading ``# fragment`` comment or containing
``...`` placeholders are illustrative and skipped. This caught real
drift on first run (RedfieldSolver ctor args, DrudeBath ctor names,
a cross-contaminated qchem flow).
"""
import os
import re
from pathlib import Path

import pytest

DOCS = Path(__file__).parent.parent / "docs"
BLOCK = re.compile(r"```python\n(.*?)```", re.S)


def _files():
    return sorted(p.name for p in DOCS.glob("*.md")
                  if BLOCK.search(p.read_text()))


@pytest.mark.slow
@pytest.mark.parametrize("fname", _files())
def test_doc_snippets_execute(fname, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)          # snippets may write files
    blocks = BLOCK.findall((DOCS / fname).read_text())
    ns = {}
    ran = 0
    for i, block in enumerate(blocks):
        if block.lstrip().startswith("# fragment") or "..." in block:
            continue
        exec(compile(block, f"{fname}[{i}]", "exec"), ns)
        ran += 1
    assert ran > 0 or len(blocks) > 0
