"""Headless JSON serving contract — the reference's FastAPI surface
(api_catch.py:17-118) without an HTTP listener.

The reference exposes three POST endpoints taking
``{"data": [[...], ...], "columns": [...]}`` and returning
``{"outliers": [record, ...]}``; strings (the "No outliers" /
"No Outliers Today!" contract) become ``[{"message": str}]`` and
errors mirror FastAPI's ``{"detail": str}`` with a status code.
``handle_api_request`` reproduces those semantics over the compat
layer, and the CLI (``python -m pycatcher_ray api --endpoint X``)
reads one request JSON on stdin and writes the response JSON on
stdout — the headless equivalent of one HTTP round trip (this engine
is a batch system; a long-lived listener adds nothing the driver can
check).
"""

from __future__ import annotations

import pandas as pd

__all__ = ["ENDPOINTS", "handle_api_request"]


def _to_frame(payload: dict) -> pd.DataFrame:
    df = pd.DataFrame(data=payload["data"], columns=payload["columns"])
    # api_catch.py:34-39: coerce the first column to datetime if needed
    if not pd.api.types.is_datetime64_any_dtype(df.iloc[:, 0]):
        df.isetitem(0, pd.to_datetime(df.iloc[:, 0]))
    return df


def _records(outliers) -> list[dict]:
    if isinstance(outliers, pd.DataFrame):
        return outliers.reset_index().to_dict(orient="records")
    if isinstance(outliers, str):  # "No outliers found." / "No Outliers Today!"
        return [{"message": outliers}]
    raise ValueError("Unexpected output from the function.")


def _find_outliers(df: pd.DataFrame):
    from .compat import find_outliers_iqr

    return find_outliers_iqr(df)


def _stl(df: pd.DataFrame):
    from .compat import detect_outliers_stl

    out = detect_outliers_stl(df)
    if not isinstance(out, pd.DataFrame):
        # api_catch.py:79-81 turns the string case into a 400
        raise ValueError("No outliers detected or an error occurred.")
    return out


def _today_classic(df: pd.DataFrame):
    from .compat import detect_outliers_today_classic

    return detect_outliers_today_classic(df)


ENDPOINTS = {
    "find_outliers": _find_outliers,
    "detect_outliers_stl": _stl,
    "detect_outliers_today_classic": _today_classic,
}


def handle_api_request(endpoint: str, payload: dict) -> tuple[int, dict]:
    """(status_code, response_body) for one request — the reference's
    endpoint semantics incl. its error mapping."""
    fn = ENDPOINTS.get(endpoint)
    if fn is None:
        return 404, {"detail": f"unknown endpoint {endpoint!r}"}
    try:
        df = _to_frame(payload)
    except Exception as exc:
        return 400, {"detail": f"Error converting first column to datetime: {exc}"}
    try:
        return 200, {"outliers": _records(fn(df))}
    except ValueError as exc:
        return 400, {"detail": str(exc)}
    except Exception as exc:
        return 500, {"detail": str(exc)}
