from qspec_tpu.lora.layers import (LoRAConfig, init_lora_params, load_peft_adapter,
                                   lora_delta)

__all__ = ["LoRAConfig", "init_lora_params", "load_peft_adapter", "lora_delta"]
