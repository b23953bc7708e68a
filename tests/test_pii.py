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
