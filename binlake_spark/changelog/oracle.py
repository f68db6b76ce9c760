"""Reference oracle: the final table state a correct engine must reach.

Pure pandas, independent of every Spark code path (SURVEY §5.2):
    sort by seq → dedup retransmits → last event per doc_id wins →
    drop docs whose last op is D → project payload (+ promoted columns).

Judged on exact token-array equality per doc_id (BASELINE input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def oracle_final_state(change_log: pd.DataFrame, drop_corrupt: bool = True) -> pd.DataFrame:
    df = change_log.copy()
    # row-change ops only: statement events (op 'Q', the DDL scenario)
    # carry no row image and never reach the table
    df = df[df["op"].isin(["I", "U", "D"])]
    if drop_corrupt:
        lens = df["tokens"].map(len)
        df = df[lens.to_numpy() == df["n_tok"].to_numpy()]
    # retransmits are verbatim duplicates of (doc_id, seq); keep one
    df = df.sort_values("seq", kind="stable").drop_duplicates(
        subset=["doc_id", "seq"], keep="first"
    )
    last = df.groupby("doc_id", sort=True).tail(1)
    live = last[last["op"] != "D"].copy()

    has_lang = df["extra"].map(lambda kv: any(k == "lang" for k, _ in kv)).any()
    if has_lang:
        live["lang"] = live["extra"].map(
            lambda kv: dict(kv).get("lang")
        )
        cols = ["doc_id", "tokens", "n_tok", "source", "lang"]
    else:
        cols = ["doc_id", "tokens", "n_tok", "source"]
    out = live[cols].sort_values("doc_id").reset_index(drop=True)
    out["tokens"] = out["tokens"].map(lambda a: np.asarray(a, dtype=np.int32))
    return out
