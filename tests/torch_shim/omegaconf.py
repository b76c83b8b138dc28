"""Minimal `omegaconf` stand-in: the reference model code only uses
ListConfig/DictConfig for isinstance checks and OmegaConf helpers in
non-model paths."""


class ListConfig(list):
    pass


class DictConfig(dict):
    pass


class OmegaConf:
    @staticmethod
    def create(obj=None):
        if isinstance(obj, dict):
            return DictConfig(obj)
        if isinstance(obj, (list, tuple)):
            return ListConfig(obj)
        return DictConfig()

    @staticmethod
    def to_container(cfg, resolve=True):
        return dict(cfg) if isinstance(cfg, dict) else list(cfg)

    @staticmethod
    def set_struct(cfg, value):
        pass
