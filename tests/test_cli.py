"""CLI end-to-end through main() (argument wiring + output contracts)."""

import json

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.cli import main

from fixtures import textured_image


@pytest.fixture(scope="module")
def photo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliphotos")
    for s in (1, 2):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(d / f"c{s}.png")
    return d


@pytest.fixture(scope="module")
def db(tmp_path_factory, photo_dir):
    db_path = str(tmp_path_factory.mktemp("clidb") / "cli.db")
    assert main(["init", db_path, "--dim", "16"]) == 0
    assert main(["add-folder", db_path, str(photo_dir)]) == 0
    assert main(["index", db_path, "--dim", "16", "--workers", "2"]) == 0
    return db_path


def test_folders_lists(db, photo_dir, capsys):
    assert main(["folders", db]) == 0
    assert str(photo_dir) in capsys.readouterr().out


def test_search_json(db, capsys):
    assert main(["search", db, "c1", "--dim", "16", "--json"]) == 0
    results = json.loads(capsys.readouterr().out)
    assert len(results) == 1
    assert results[0]["filename"] == "c1.png"


def test_similar_finds_self(db, photo_dir, capsys):
    assert main(
        ["similar", db, str(photo_dir / "c2.png"), "--dim", "16", "--json"]
    ) == 0
    out = capsys.readouterr().out
    results = json.loads(out)
    assert results[0]["filename"] == "c2.png"
    assert results[0]["distance"] < 1e-5


def test_similar_scan_mode_exact(db, photo_dir, capsys):
    assert main(
        ["similar", db, str(photo_dir / "c2.png"), "--dim", "16", "--json",
         "--scan-mode", "exact"]
    ) == 0
    results = json.loads(capsys.readouterr().out)
    assert results[0]["filename"] == "c2.png"


def test_bad_query_exits_1(db, capsys):
    assert main(["search", db, 'broken "quote', "--dim", "16"]) == 1
    assert "tokenization failed" in capsys.readouterr().err


def test_missing_file_exits_1(db, capsys):
    assert main(["similar", db, "/nope/missing.png", "--dim", "16"]) == 1
    assert "error" in capsys.readouterr().err


def test_stats_json(db, capsys):
    assert main(["stats", db, "--dim", "16"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["images"] == 2
    assert stats["semantic_dim"] == 16


def test_show(db, capsys):
    assert main(["show", db, "1"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["id"] == 1


def test_show_missing_exits_1(db, capsys):
    assert main(["show", db, "999"]) == 1


def test_phash_similar(db, photo_dir, capsys):
    assert main(
        ["phash-similar", db, str(photo_dir / "c1.png"), "--dim", "16", "--json"]
    ) == 0
    results = json.loads(capsys.readouterr().out)
    assert results[0]["filename"] == "c1.png"
    assert results[0]["distance"] == 0.0
