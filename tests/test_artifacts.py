"""Committed-artifact integrity checks.

Round-3 advisor finding: a checkpoint's ocdbt manifests were committed while
its `d/` data shards were deleted (hidden afterwards by the `ckpts/`
gitignore), so a fresh clone could not restore it even though
docs/ARTIFACTS.md said it was committed.  These tests pin the invariant:
every checkpoint whose metadata is in git also has at least one committed
data shard, and every committed checkpoint restores.
"""

import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _committed_files():
    out = subprocess.run(
        ["git", "ls-files", "ckpts/"], cwd=REPO, capture_output=True,
        text=True, check=True).stdout
    return [line for line in out.splitlines() if line]


def _committed_ckpts():
    names = set()
    for f in _committed_files():
        parts = Path(f).parts
        if len(parts) >= 2:
            names.add(parts[1])
    return sorted(names)


def test_committed_checkpoints_have_data_shards():
    files = _committed_files()
    missing = []
    for name in _committed_ckpts():
        mine = [f for f in files if f.startswith(f"ckpts/{name}/")]
        has_manifest = any(f.endswith("manifest.ocdbt") for f in mine)
        has_shards = any("/d/" in f for f in mine)
        if has_manifest and not has_shards:
            missing.append(name)
    assert not missing, (
        f"checkpoints committed without their ocdbt d/ shards (unrestorable "
        f"from a fresh clone): {missing} — `git add -f ckpts/<name>`")


def test_committed_checkpoints_restore():
    from irbfn_tpu.train.checkpoints import load_model

    for name in _committed_ckpts():
        cfg_path = REPO / "configs" / f"{name}.yaml"
        if not cfg_path.exists():
            pytest.fail(f"ckpts/{name} committed but configs/{name}.yaml "
                        "missing — the pair is the artifact")
        model, params, cfg = load_model(str(cfg_path),
                                        str(REPO / "ckpts" / name))
        assert params is not None, f"ckpts/{name} failed to restore"


# ---------------------------------------------------------------------------
# Citation integrity: every data/ ckpts/ tests/oracles/ path named in the
# headline docs must exist in git (round-4 verdict weak #1/#3: BASELINE cited
# pickles and a ckpt that were never committed, and the gitignore silently
# swallowed a claimed test oracle — twice in two rounds).
# ---------------------------------------------------------------------------

CITED_DOCS = ["BASELINE.md", "docs/ARTIFACTS.md", "README.md", "CLAUDE.md"]

# Regenerate-only artifacts: GB-scale solver tables whose commands live in
# docs/ARTIFACTS.md §"Solver tables (regenerate; not committed)".
REGEN_ONLY_PREFIXES = (
    "data/frenet_table_", "data/cart_table_", "data/goal_mpc_table_",
    "data/lut_",
)

_PATH_RE = re.compile(r"(?:data|ckpts|tests/oracles)/[A-Za-z0-9_.\-/]+")


def _cited_paths():
    cited = {}
    for doc in CITED_DOCS:
        text = (REPO / doc).read_text()
        for m in _PATH_RE.finditer(text):
            p = m.group(0).rstrip(".")
            # skip templated citations (`ckpts/bank6_pr_mu<MU>` etc.) by
            # checking the surrounding chars for placeholder syntax
            tail = text[m.end():m.end() + 1]
            if tail in "<{*" or "mu<" in p:
                continue
            cited.setdefault(p, set()).add(doc)
    return cited


def _tracked():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, capture_output=True,
                         text=True, check=True).stdout
    return set(out.splitlines())


def test_cited_artifacts_are_committed():
    tracked = _tracked()
    missing = []
    for path, docs in sorted(_cited_paths().items()):
        if path.startswith(REGEN_ONLY_PREFIXES):
            continue
        # a citation may name a file, a directory (ckpt trees), or an
        # extensionless --out_name stem (scripts append .pkl)
        stem = path.rstrip("/")
        hit = path in tracked or any(
            t.startswith(stem + "/") or t.startswith(stem + ".")
            for t in tracked)
        if not hit:
            missing.append(f"{path} (cited in {', '.join(sorted(docs))})")
    assert not missing, (
        "artifact paths cited in headline docs but absent from git — commit "
        "them (`git add -f`) or de-cite:\n  " + "\n  ".join(missing))
