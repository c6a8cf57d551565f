from saena_tpu.core.coo import CooBuilder, coo_to_csr, remove_boundary_nodes
