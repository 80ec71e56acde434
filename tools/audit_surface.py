"""Audit the engine's pandas-API coverage: walk pandas' public
DataFrame/Series/DataFrameGroupBy surfaces and report which verbs the
engine implements.  Out-of-scope families (plotting, timezone
localization, pickle/clipboard/xarray-style exports, sparse/flags
internals) are listed separately rather than counted as gaps."""
from __future__ import annotations

import pandas as pd

OUT_OF_SCOPE_PREFIXES = ("to_", "plot", "hist", "boxplot", "style",
                         "sparse", "attrs", "flags", "set_flags")
# first/last(offset) and DataFrameGroupBy.fillna are DEPRECATED in
# pandas 2.x (removed in 3.0) - deliberate omissions, not gaps
OUT_OF_SCOPE = {
    "first", "last", "fillna_groupby",
    "asfreq", "at", "iat", "axes", "swapaxes", "to_period",
    "to_timestamp", "tz_convert", "tz_localize", "infer_objects",
    "interpolate", "memory_usage", "nbytes", "ndim", "array",
    "ravel", "view", "list", "struct", "dtype", "dtypes",
    "isetitem", "reorder_levels", "backfill", "pad", "case_when",
    "divmod", "rdivmod", "grouper", "groups", "indices", "keys",
    "level", "ohlc", "resample",
}
IN_SCOPE_TO = {"to_csv", "to_dict", "to_json", "to_numpy",
               "to_parquet", "to_frame", "to_list", "to_pandas",
               "to_spark", "to_string", "to_orc"}


GROUPBY_DEPRECATED = {"fillna", "dtypes", "corrwith"}


def audit(pd_cls, eng_cls, name, extra_oos=()):
    have, missing, oos = [], [], []
    for m in sorted(dir(pd_cls)):
        if m.startswith("_"):
            continue
        in_scope = not (
            (m.startswith(OUT_OF_SCOPE_PREFIXES)
             and m not in IN_SCOPE_TO) or m in extra_oos)
        if hasattr(eng_cls, m):
            have.append(m)
        elif in_scope and m not in OUT_OF_SCOPE:
            missing.append(m)
        else:
            oos.append(m)
    pub = [m for m in dir(pd_cls) if not m.startswith("_")]
    print(f"## {name}: {len(have)}/{len(pub)} public pandas members "
          f"implemented; {len(missing)} in-scope gaps, "
          f"{len(oos)} out-of-scope")
    if missing:
        print("   gaps:", ", ".join(missing))
    return have, missing, oos


#: window sub-object attrs that are config/introspection state, not
#: verbs (plus validate/is_datetimelike internals)
WINDOW_OOS = {"axis", "center", "closed", "exclusions", "method",
              "min_periods", "ndim", "obj", "on", "step", "win_type",
              "window", "validate", "is_datetimelike"}


def main():
    import pandas_alchemy_spark as pas
    from pandas_alchemy_spark.operators.analytic import (Expanding,
                                                         Rolling)
    from pandas_alchemy_spark.relational import GroupBy
    audit(pd.DataFrame, pas.DataFrame, "DataFrame")
    audit(pd.Series, pas.Series, "Series")
    audit(pd.core.groupby.DataFrameGroupBy, GroupBy,
          "DataFrameGroupBy", extra_oos={"fillna"})
    # round 6: the top-level walk never saw the window sub-objects
    audit(pd.core.window.Rolling, Rolling, "Rolling",
          extra_oos=WINDOW_OOS)
    audit(pd.core.window.Expanding, Expanding, "Expanding",
          extra_oos=WINDOW_OOS)


if __name__ == "__main__":
    main()
