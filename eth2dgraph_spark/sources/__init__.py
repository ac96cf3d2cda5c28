from .testdata import load_testdata, register_testdata_views
from .eth import read_eth_table, write_eth_table

__all__ = [
    "load_testdata",
    "register_testdata_views",
    "read_eth_table",
    "write_eth_table",
]
