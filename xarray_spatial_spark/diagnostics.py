"""Pre-flight diagnostics — the reference's ``diagnose`` lint
(xrspatial/diagnostics.py:113-166) re-expressed for the Spark data
model.

The reference inspects a DataArray's coords/attrs plus a sampled
value range; here the horizontal side comes from the ``GridSpec``
(unit + resolution) and the vertical side from the raster values via
one tiny agg job (or ``tiled.global_stats`` for dense tiles) — never
a full driver materialization.  Unit inference mirrors the
reference's heuristics (utils.py:455-536): explicit units win;
otherwise degree-range coordinates vs elevation-range values.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.grid import GridSpec

_DEGREE_UNITS = {"degree", "degrees", "deg"}
_LINEAR_UNITS = {
    "m", "meter", "metre", "meters", "metres",
    "km", "kilometer", "kilometre", "kilometers", "kilometres",
    "ft", "foot", "feet",
}
_ANGLE_UNITS = {"degree", "degrees", "deg", "rad", "radian", "radians"}


@dataclass
class DiagnosticIssue:
    code: str
    severity: str  # 'warning' | 'error'
    message: str
    suggestion: str


@dataclass
class DiagnosticReport:
    issues: list[DiagnosticIssue] = field(default_factory=list)
    horizontal_unit_type: str | None = None
    vertical_unit_type: str | None = None
    resolution: tuple | None = None

    @property
    def has_issues(self) -> bool:
        return bool(self.issues)

    @property
    def has_warnings(self) -> bool:
        return any(i.severity == "warning" for i in self.issues)

    @property
    def has_errors(self) -> bool:
        return any(i.severity == "error" for i in self.issues)

    def __str__(self) -> str:
        if not self.issues:
            return "No issues detected."
        lines = []
        for i in self.issues:
            lines.append(f"[{i.severity.upper()}] {i.code}: {i.message}")
            lines.append(f"  Suggestion: {i.suggestion}")
        return "\n".join(lines)


def _horizontal_unit_type(spec: GridSpec) -> str:
    unit = (spec.unit or "").lower()
    if unit in _DEGREE_UNITS:
        return "degrees"
    if unit in _LINEAR_UNITS:
        return "linear"
    # numeric heuristic (reference utils.py:483-503): coordinate spans
    # inside the lon/lat envelope with sub-degree spacing look like
    # degrees
    x_lo, x_hi = spec.x_coord(0), spec.x_coord(spec.width - 1)
    y_lo, y_hi = spec.y_coord(spec.height - 1), spec.y_coord(0)
    in_lon = -360.0 <= min(x_lo, x_hi) and max(x_lo, x_hi) <= 360.0
    in_lat = -90.0 <= min(y_lo, y_hi) and max(y_lo, y_hi) <= 90.0
    if in_lon and in_lat and abs(spec.xres) < 1.0 and abs(spec.yres) < 1.0:
        return "degrees"
    return "unknown"


def _vertical_unit_type(
    df: DataFrame | None, value_col: str, value_unit: str | None
) -> str:
    unit = (value_unit or "").lower()
    if unit in _ANGLE_UNITS:
        return "angle"
    if unit in _LINEAR_UNITS:
        return "elevation"
    if df is None:
        return "unknown"
    # one tiny agg job — the reference samples windows
    # (utils.py:517-536); a min/max agg is the Spark-cheap equivalent
    from xarray_spatial_spark import tiled as _tiled

    if _tiled.is_tiled(df):
        gs = _tiled.global_stats(df, value_col)
        vmin, vmax = gs["min"], gs["max"]
    else:
        row = df.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return "unknown"
        vmin, vmax = float(row["lo"]), float(row["hi"])
    span = vmax - vmin
    if 10.0 <= span <= 20000.0 and vmin > -500.0:
        return "elevation"
    if -360.0 <= vmin <= 360.0 and -360.0 <= vmax <= 360.0 and span <= 720.0:
        return "angle"
    return "unknown"


def diagnose(
    df: DataFrame | None,
    spec: GridSpec,
    tool: str | None = None,
    value_col: str = "value",
    value_unit: str | None = None,
) -> DiagnosticReport:
    """Lint a raster for the classic degrees-horizontal /
    meters-vertical mismatch before running surface operators
    (reference diagnostics.py:113-166; same codes/severities).

    ``df`` may be a long-form or dense-tiled raster (or None to skip
    the value-range sampling job)."""
    report = DiagnosticReport()
    unit_mismatch_tools = {"slope", "aspect", "curvature", "hillshade"}
    if tool is not None and tool.lower() not in unit_mismatch_tools:
        return report

    report.resolution = spec.cellsize
    horiz = _horizontal_unit_type(spec)
    vert = _vertical_unit_type(df, value_col, value_unit)
    if horiz != "unknown":
        report.horizontal_unit_type = horiz
    report.vertical_unit_type = vert

    if horiz == "degrees" and vert == "elevation":
        report.issues.append(DiagnosticIssue(
            code="UNIT_MISMATCH",
            severity="warning",
            message=(
                "Input raster appears to have coordinates in degrees "
                "but elevation values in a linear unit (e.g. meters/feet)."
            ),
            suggestion=(
                "Slope/aspect/curvature operations expect horizontal "
                "distances in the same units as vertical. Consider "
                "reprojecting to a projected CRS with meter-based "
                "coordinates (or use the geodesic slope/aspect variants)."
            ),
        ))
    return report
