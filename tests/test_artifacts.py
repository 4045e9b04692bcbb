"""Cached artifact resolution (reference flair/file_utils.py)."""

import os
import tarfile
import zipfile
from pathlib import Path

import pytest

from kbner_tpu.utils.artifacts import (cached_path, extract_archive,
                                       url_to_filename)


def test_local_path_passthrough(tmp_path):
    f = tmp_path / "a.txt"
    f.write_text("x")
    assert cached_path(f) == f
    with pytest.raises(FileNotFoundError):
        cached_path(tmp_path / "missing.txt")


def test_url_cache_hit(tmp_path):
    url = "https://example.com/emb/vectors.vec"
    name = url_to_filename(url)
    assert name.endswith(".vec")
    (tmp_path / name).write_text("2 2\na 1 2\nb 3 4\n")  # pre-seeded
    p = cached_path(url, cache_dir=tmp_path)
    assert p.read_text().startswith("2 2")


def test_url_miss_raises_without_optin(tmp_path, monkeypatch):
    monkeypatch.delenv("KBNER_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(FileNotFoundError, match="pre-seed|Pre-seed"):
        cached_path("https://example.com/nope.bin", cache_dir=tmp_path)


def test_extract_zip_and_tar(tmp_path):
    z = tmp_path / url_to_filename("https://x/y/model.zip")
    with zipfile.ZipFile(z, "w") as f:
        f.writestr("inner/weights.txt", "w")
    out = cached_path("https://x/y/model.zip", cache_dir=tmp_path,
                      extract=True)
    assert (out / "inner" / "weights.txt").read_text() == "w"
    # idempotent
    assert extract_archive(z) == out

    t = tmp_path / "m.tar.gz"
    src = tmp_path / "payload.txt"
    src.write_text("p")
    with tarfile.open(t, "w:gz") as f:
        f.add(src, arcname="payload.txt")
    out2 = extract_archive(t)
    assert (out2 / "payload.txt").read_text() == "p"
