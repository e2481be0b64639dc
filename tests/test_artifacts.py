"""Committed-artifact integrity checks.

Round-3 advisor finding: a checkpoint's ocdbt manifests were committed while
its `d/` data shards were deleted (hidden afterwards by the `ckpts/`
gitignore), so a fresh clone could not restore it even though
docs/ARTIFACTS.md said it was committed.  These tests pin the invariant:
every checkpoint whose metadata is in git also has at least one committed
data shard, and every committed checkpoint restores.
"""

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
