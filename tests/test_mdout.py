"""write_preserving: regenerating a bench md must never destroy the
hand-appended evidence sections (round-2 regression, see CLAUDE.md)."""
from osm_io_spark.jobs.mdout import HAND_MARKER, write_preserving


def test_preserves_hand_tail(tmp_path):
    p = str(tmp_path / "BASELINE.md")
    write_preserving(p, "# gen v1\n\n| a | 1 |")
    s1 = open(p).read()
    assert s1.startswith("# gen v1") and HAND_MARKER in s1

    # a human appends evidence below the marker
    with open(p, "a") as fh:
        fh.write("\n## Hand section\n\nmeasured 2.02x\n")

    write_preserving(p, "# gen v2\n\n| a | 2 |")
    s2 = open(p).read()
    assert s2.startswith("# gen v2")
    assert "| a | 1 |" not in s2
    assert "## Hand section" in s2 and "measured 2.02x" in s2
    # marker still present exactly once, so a THIRD regeneration works
    assert s2.count(HAND_MARKER) == 1

    write_preserving(p, "# gen v3\n")
    s3 = open(p).read()
    assert s3.startswith("# gen v3") and "measured 2.02x" in s3


def test_no_marker_file_gets_seeded(tmp_path):
    p = str(tmp_path / "new.md")
    write_preserving(p, "# fresh")
    assert open(p).read().count(HAND_MARKER) == 1


def test_shipped_bench_files_carry_marker():
    for path in ("BENCH/BASELINE.md", "BENCH/INGEST.md"):
        assert open(path).read().count(HAND_MARKER) == 1, path
