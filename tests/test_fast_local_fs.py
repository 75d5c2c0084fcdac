"""FastLocalFileSystem activation must be probe-gated: a stale or foreign
.class (wrong bytecode level for the running JVM) must never be installed —
it would brick every Hadoop file op with UnsupportedClassVersionError
instead of falling back to RawLocalFileSystem."""

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cds_spark.session import (  # noqa: E402
    _class_major,
    _ensure_fast_local_fs,
    _java_major,
)


def _write_fake_class(path: str, major: int) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\xca\xfe\xba\xbe\x00\x00" + major.to_bytes(2, "big") + b"\x00" * 8)


def test_no_class_committed_to_git():
    repo = Path(__file__).resolve().parents[1]
    import subprocess

    out = subprocess.run(
        ["git", "-C", str(repo), "ls-files", "*.class"],
        capture_output=True, text=True,
    )
    assert out.stdout.strip() == "", f"compiled binaries tracked in git: {out.stdout}"


def test_class_major_reads_bytecode_level(tmp_path):
    p = str(tmp_path / "X.class")
    _write_fake_class(p, 61)
    assert _class_major(p) == 61
    with open(p, "wb") as f:
        f.write(b"not a classfile")
    assert _class_major(p) is None
    assert _class_major(str(tmp_path / "missing.class")) is None


def test_future_bytecode_class_is_rejected_and_recompiled(tmp_path):
    """Plant a class targeting an impossible future JVM in the keyed build
    dir; _ensure_fast_local_fs must refuse to serve it. With the real .java
    source beside it, it recompiles to a loadable class; the returned
    classpath (if any) must contain bytecode the current JVM can load."""
    jvm_major = _java_major()
    if jvm_major is None:
        import pytest

        pytest.skip("no JVM on PATH/JAVA_HOME")
    jvm_dir = str(tmp_path / "jvm")
    os.makedirs(jvm_dir)
    real_src = (
        Path(__file__).resolve().parents[1]
        / "cds_spark" / "jvm" / "FastLocalFileSystem.java"
    )
    shutil.copy(real_src, jvm_dir)
    stale = os.path.join(jvm_dir, "build", f"jdk{jvm_major}", "FastLocalFileSystem.class")
    _write_fake_class(stale, (jvm_major + 44) + 10)  # 10 majors in the future

    cp = _ensure_fast_local_fs(jvm_dir)
    if cp is None:
        # no javac available: the stale class must NOT have been served
        assert True
    else:
        cls = os.path.join(cp, "FastLocalFileSystem.class")
        assert _class_major(cls) - 44 <= jvm_major


def test_compatible_class_is_reused_without_javac(tmp_path, monkeypatch):
    """A previously-compiled compatible class is accepted even when javac
    disappears (deploy image without a JDK)."""
    jvm_major = _java_major()
    if jvm_major is None:
        import pytest

        pytest.skip("no JVM on PATH/JAVA_HOME")
    jvm_dir = str(tmp_path / "jvm")
    ok = os.path.join(jvm_dir, "build", f"jdk{jvm_major}", "FastLocalFileSystem.class")
    _write_fake_class(ok, jvm_major + 44)
    cp = _ensure_fast_local_fs(jvm_dir)  # no .java source present at all
    assert cp == os.path.dirname(ok)
