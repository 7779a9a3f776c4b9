from .config import (
    NoneDict,
    check_resume,
    dict2str,
    dict_to_nonedict,
    opt_get,
    parse,
    parse_dict,
    read_json,
    read_yaml,
    INTERP_CODES,
)
from .defaults import (
    get_network_D_config,
    get_network_G_config,
    get_network_defaults,
)

__all__ = [
    "NoneDict", "check_resume", "dict2str", "dict_to_nonedict", "opt_get",
    "parse", "parse_dict", "read_json", "read_yaml", "INTERP_CODES",
    "get_network_D_config", "get_network_G_config", "get_network_defaults",
]
