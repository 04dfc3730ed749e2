from .tables import load_table, register_views  # noqa: F401
from .sensor_view import sensor_readings, quality_checked, SENSOR_ORACLE_CTE  # noqa: F401
