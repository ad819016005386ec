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

__all__ = ["ENDPOINTS", "handle_api_request", "process_upload",
           "create_app", "generate_plot_response", "register_routes",
           "setup_logging"]


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


# ----------------------------------------------------- webapp contract


def _reset_safe(df: pd.DataFrame) -> pd.DataFrame:
    # detectors that index by the (retained) date column would collide
    # on reset_index; drop the index instead of duplicating the column
    if df.index.name is not None and df.index.name in df.columns:
        return df.reset_index(drop=True)
    return df.reset_index()


def process_upload(csv_bytes: bytes, method: str = "comprehensive") -> dict:
    """The reference webapp's ``FileProcessor.process_file``
    (webapp.py:54-150) headlessly: CSV bytes → detector → the same
    response envelope.  Divergences (documented): 'table' carries JSON
    records instead of styled HTML, and 'plot' carries the boxplot DATA
    (build_iqr_plot_data) instead of a base64 PNG — matplotlib is a
    rendering concern this engine does not ship."""
    import io

    from . import compat

    df = pd.read_csv(io.BytesIO(csv_bytes))
    plot_data = None
    if method == "comprehensive":
        outliers = compat.detect_outliers_classic(df)
        plot_data = compat.build_iqr_plot_data(df).iloc[0].to_dict()
    elif method == "stl":
        outliers = compat.detect_outliers_stl(df)
    elif method == "moving_average":
        outliers = compat.detect_outliers_moving_average(df)
    else:
        raise ValueError("Invalid analysis method selected.")

    if not isinstance(outliers, pd.DataFrame):
        return {
            "success": True,
            "message": "Analysis completed successfully",
            "data": {
                "table": "No outliers found",
                "summary": {
                    "total_rows": len(df),
                    "outlier_rows": 0,
                    "outlier_percentage": 0,
                    "columns_analyzed": list(df.columns),
                },
                "plot": plot_data,
            },
        }
    total_rows = len(df)
    outlier_rows = len(outliers)
    return {
        "success": True,
        "message": "Analysis completed successfully",
        "data": {
            "table": _reset_safe(outliers).to_dict(orient="records"),
            "summary": {
                "total_rows": total_rows,
                "outlier_rows": outlier_rows,
                "outlier_percentage": (outlier_rows / total_rows) * 100,
                "columns_analyzed": list(df.columns),
            },
            "plot": plot_data,
        },
    }


def create_app():
    """WSGI app with the reference's serving surface: the webapp's
    POST /upload (CSV body; ``?method=`` selects the detector,
    webapp.py:166-203) and api_catch's three POST JSON endpoints.
    Pure stdlib (any WSGI server, e.g. ``wsgiref.simple_server``,
    can host it) — the functional replacement for Flask/FastAPI,
    which do not ship in this container."""
    import json

    def app(environ, start_response):
        def respond(status_code: int, body: dict):
            payload = json.dumps(body, default=str).encode()
            start_response(
                f"{status_code} " + {200: "OK", 400: "Bad Request",
                                     404: "Not Found",
                                     405: "Method Not Allowed",
                                     500: "Error"}.get(status_code, "Error"),
                [("Content-Type", "application/json"),
                 ("Content-Length", str(len(payload)))],
            )
            return [payload]

        path = (environ.get("PATH_INFO") or "/").strip("/")
        if environ.get("REQUEST_METHOD") != "POST":
            return respond(405, {"detail": "POST only"})
        try:
            size = int(environ.get("CONTENT_LENGTH") or 0)
            raw = environ["wsgi.input"].read(size)
        except Exception as exc:
            return respond(400, {"detail": f"unreadable body: {exc}"})

        if path == "upload":
            from urllib.parse import parse_qs

            method = parse_qs(environ.get("QUERY_STRING", "")).get(
                "method", ["comprehensive"])[0]
            try:
                return respond(200, process_upload(raw, method))
            except ValueError as exc:
                return respond(400, {"success": False, "message": str(exc)})
            except Exception as exc:
                return respond(500, {"success": False, "message": str(exc)})
        if path in ENDPOINTS:
            try:
                payload = json.loads(raw)
            except Exception as exc:
                return respond(400, {"detail": f"invalid JSON: {exc}"})
            status, body = handle_api_request(path, payload)
            return respond(status, body)
        return respond(404, {"detail": f"unknown route /{path}"})

    return app


def generate_plot_response(plot_function, df: pd.DataFrame) -> dict:
    """Headless twin of api_diagnostics.generate_plot_response:41: the
    reference renders ``plot_function(df)`` to a base64 PNG
    (``{"plot_image": ...}``); this engine's plot builders return DATA
    tables, so the response carries the table itself as
    ``{"plot_data": {"columns": [...], "data": [[...], ...]}}`` —
    same request/response shape, raster swapped for the data product
    (documented divergence: no matplotlib in a headless engine).
    Errors mirror the reference's HTTP 500 detail contract as
    ``ValueError`` for the WSGI layer to map."""
    try:
        out = plot_function(df)
    except Exception as exc:  # reference: HTTPException(500, str(e))
        raise ValueError(str(exc)) from exc
    table = out.reset_index() if isinstance(out, pd.DataFrame) else \
        pd.DataFrame({"value": [out]})
    return {
        "plot_data": {
            "columns": [str(c) for c in table.columns],
            "data": table.astype(object).where(table.notna(), None)
                    .values.tolist(),
        }
    }


def register_routes(app=None):
    """Reference webapp.register_routes:157 name parity: the Flask
    route table is built inside ``create_app`` here (stdlib WSGI — no
    Flask app object to mutate), so this returns the fully-routed app
    (building one if none is passed)."""
    return app if app is not None else create_app()


def setup_logging(app=None, *, log_dir: str = "logs",
                  debug: bool = False):
    """Reference __init__.setup_logging:133 twin: rotating-file logging
    for the serving surface (logs/pycatcher.log, 10 MB x 10 backups,
    DEBUG when debugging else INFO, the reference's record format).
    The WSGI app here is a plain callable with no ``.logger``, so the
    handler attaches to the engine's ``pycatcher_ray.serving`` logger
    and the configured logger is returned."""
    import logging
    import os
    from logging.handlers import RotatingFileHandler

    os.makedirs(log_dir, exist_ok=True)
    handler = RotatingFileHandler(
        os.path.join(log_dir, "pycatcher.log"),
        maxBytes=10485760, backupCount=10)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
    handler.setLevel(logging.DEBUG if debug else logging.INFO)
    log = logging.getLogger("pycatcher_ray.serving")
    # idempotent: a second setup call must not stack duplicate handlers
    log.handlers = [h for h in log.handlers
                    if not isinstance(h, RotatingFileHandler)]
    log.addHandler(handler)
    log.setLevel(logging.DEBUG if debug else logging.INFO)
    return log
