from .net import cidr_hosts, ip_int_to_str, ip_str_to_int  # noqa: F401
from .json_repair import repair_json_column, repair_json_str  # noqa: F401
