from tfhe_aes2_tpu.utils.bits import (
    bits_to_u64,
    bits_to_u8,
    u16_to_bits,
    u64_to_bits,
    u8_to_bits,
    bytes_to_bits,
    bits_to_bytes,
)
