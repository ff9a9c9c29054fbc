"""``etdmap.record_validators`` shim: per-Diff physical thresholds.

Used at reference vectorized_impute.py:222-223,761-762 as
``thresholds_dict[diff_col]["Min"/"Max"]``. Mirrors
``etdtransform_spark.config.THRESHOLDS`` so both engines clamp with the
same bounds (the shape — dict keyed by Diff column with Min/Max — is
fixed by the reference's subscript usage).
"""

from etdtransform_spark.config import THRESHOLDS

thresholds_dict = {k: dict(v) for k, v in THRESHOLDS.items()}
