"""Raw-log source: line splitting, lineage, end-to-end parse."""

from __future__ import annotations


def test_read_and_parse_raw_syslog(ray_session, tmp_path):
    from rayslog.sources.rawlog import parse_syslog_files, read_syslog_text

    f1 = tmp_path / "a.log"
    f1.write_text(
        "<34>Oct 11 22:14:15 mymachine su: one\n"
        "<165>1 2023-10-11T22:14:15.003Z host app 1 ID1 - two\n"
        "garbage line that fails\n"
    )
    f2 = tmp_path / "b.log"
    f2.write_text("<30>Jun 23 13:17:42 localhost foo: three\n")

    ds = read_syslog_text([str(f1), str(f2)])
    df = ds.to_pandas()
    assert len(df) == 4
    assert set(df["source_file"].map(lambda p: p.rsplit("/", 1)[-1])) == {
        "a.log", "b.log",
    }
    assert df[df["source_file"].str.endswith("a.log")]["line_no"].tolist() == [
        0, 1, 2,
    ]

    parsed = parse_syslog_files([str(f1), str(f2)]).to_pandas()
    ok = parsed[parsed["parse_error"].isna()]
    assert len(ok) == 3
    assert set(ok["severity"]) == {2, 5, 6}
    bad = parsed[parsed["parse_error"].notna()]
    assert len(bad) == 1
