from .logging import timestamp, log, set_show_timestamp
from .formats import format_g
