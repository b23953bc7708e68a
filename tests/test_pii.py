"""PII scrubbing (ops/pii.py)."""

import pyarrow as pa

from harvester_ray.ops import pii


def test_scrub_redacts_and_counts(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "mail a.b+c@foo-bar.example.com and x@y.io now",
                        "server at 192.168.0.1 called +1-555-123-4567 twice",
                        "nothing sensitive here",
                    ]
                ),
            }
        )
    )
    out = pii.scrub(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[0, ["n_emails", "n_phones", "n_ips"]].tolist() == [2, 0, 0]
    assert out.loc[1, "clean_text"] == "server at <IP> called <PHONE> twice"
    assert out.loc[1, ["n_emails", "n_phones", "n_ips"]].tolist() == [0, 1, 1]
    assert out.loc[2, "clean_text"] == "nothing sensitive here"
    assert out.loc[2, ["n_emails", "n_phones", "n_ips"]].tolist() == [0, 0, 0]


def test_email_redaction_precedes_ip(ray_session):
    import ray.data as rd

    # the dotted host inside an email must not survive as a phantom "IP"
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["ping user@10.0.0.1.example.net ok"]),
            }
        )
    )
    out = pii.scrub(ds).to_pandas()
    assert out.loc[0, "clean_text"] == "ping <EMAIL> ok"
    assert out.loc[0, ["n_emails", "n_ips"]].tolist() == [1, 0]


def _luhn_check_digit(base: str) -> str:
    # digit making base+d Luhn-valid
    for d in "0123456789":
        s = base + d
        rev = [int(c) for c in s[::-1]]
        tot = 0
        for i, v in enumerate(rev):
            if i % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            tot += v
        if tot % 10 == 0:
            return d
    raise AssertionError


def test_luhn_audit_oracle(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import pii

    rows = []
    for i in range(40):
        base = f"4{i:014d}"  # 15 digits
        num = base + _luhn_check_digit(base)
        if i % 3 == 0:
            txt = f"card {num} leaked"                      # valid 16-digit
        elif i % 3 == 1:
            bad = num[:-1] + ("0" if num[-1] != "0" else "1")
            txt = f"typo {bad} harmless"                    # fails checksum
        else:
            txt = f"short 123456 and words only"            # no candidate
        rows.append((i, txt))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = pii.luhn_audit(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(pii.luhn_audit_sql("documents")).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_valid"].sum() == 14 and got["n_candidates"].sum() == 27
    again = pii.luhn_audit(ds.repartition(5)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again, check_dtype=False)
