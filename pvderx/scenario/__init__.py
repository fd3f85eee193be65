from pvderx.scenario.events import EventSchedule, EventBuilder, active_row, make_exog
from pvderx.scenario.ride_through import RideThroughParams, RideThroughState, rt_init, rt_update
from pvderx.scenario.mppt_voltvar import MPPTState, mppt_init, mppt_update, voltvar_qref

__all__ = [
    "EventSchedule", "EventBuilder", "active_row", "make_exog",
    "RideThroughParams", "RideThroughState", "rt_init", "rt_update",
    "MPPTState", "mppt_init", "mppt_update", "voltvar_qref",
]
