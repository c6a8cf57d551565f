from saena_tpu.ops.formats import (
    EllMatrix,
    DiaMatrix,
    DenseMatrix,
    DeviceMatrix,
    ell_from_csr,
    dia_from_csr,
    dense_from_csr,
    device_matrix_from_csr,
    pad_to,
    PAD,
)
