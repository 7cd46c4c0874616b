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

ROOT = Path(__file__).parent.parent
DOCS = ROOT / "docs"
BLOCK = re.compile(r"```python\n(.*?)```", re.S)


def _files():
    cands = sorted(DOCS.glob("*.md")) + [ROOT / "README.md"]
    return [str(p.relative_to(ROOT)) for p in cands
            if p.exists() and BLOCK.search(p.read_text())]


@pytest.mark.slow
@pytest.mark.parametrize("fname", _files())
def test_doc_snippets_execute(fname, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)          # snippets may write files
    blocks = BLOCK.findall((ROOT / fname).read_text())
    ns = {}
    ran = 0
    for i, block in enumerate(blocks):
        if block.lstrip().startswith("# fragment") or "..." in block:
            continue
        exec(compile(block, f"{fname}[{i}]", "exec"), ns)
        ran += 1
    assert ran > 0 or len(blocks) > 0
