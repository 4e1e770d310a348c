from .registry import (pair_data_dict, exp_rdf_data_dict, angle_data_dict,
                       get_exp_rdf, get_unit_len, exp_angle_data, DATA_DIR)

__all__ = ["pair_data_dict", "exp_rdf_data_dict", "angle_data_dict",
           "get_exp_rdf", "get_unit_len", "exp_angle_data", "DATA_DIR"]
