from saena_tpu.io.readers import read_bin, read_mtx, read_matrix, write_bin, write_mtx
