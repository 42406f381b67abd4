from .dtype import cast_floating
from .config import Config, get_cfg, init_cfg, print_cfg, save_cfg, update_cfg
from .general import (check_file, device_resident, is_method_overridden,
                      supports_buffer_donation,
                      parse_path, to_2tuple)
from .logger import build_logger, get_logger
from .random import random_seed
from .registry import Registry, build_from_cfg
from .serialize import (
    flatten_tree,
    load_ckpt,
    load_into,
    load_model,
    save_model,
    tree_del,
    tree_get,
    tree_set,
    unflatten_tree,
)
