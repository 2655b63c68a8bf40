"""Config system: schema parity, token extension path, decoder variants."""

import yaml

from styletts2_tpu.config import load_config


def test_reference_yaml_schema_loads():
    cfg = load_config("configs/config_example.yaml")
    assert cfg.model_params.n_token == 178
    assert cfg.model_params.decoder.type == "hifigan"
    assert cfg.preprocess_params.spect_params.hop_length == 300
    assert cfg.loss_params.lambda_ce == 20.0
    assert cfg.optimizer_params.ft_lr == 1e-5
    assert cfg.tpu.frame_buckets[-1] >= 1200


def test_extended_symbols_grow_n_token():
    """The viVoice path (reference README.md:12-15): extend adds symbols and
    n_token follows (189 tokens for the published Vietnamese model)."""
    raw = yaml.safe_load(open("configs/config_example.yaml"))
    raw["symbol"]["extend"] = "ăâđêôơư̆ảạà"  # 11 new codepoints
    cfg = load_config(raw)
    assert cfg.model_params.n_token > 178


def test_decoder_variant_configs():
    for typ in ("hifigan", "istftnet", "vocos"):
        cfg = load_config({"model_params": {"decoder": {"type": typ}}})
        assert cfg.model_params.decoder.type == typ


def test_decoder_type_defaults():
    """`type: istftnet`/`vocos` alone yields the architecture the reference
    documents for that type (config_example.yaml:56-80), instead of
    silently inheriting hifigan's upsample_rates; explicit values win."""
    dec = load_config({"model_params": {"decoder": {
        "type": "istftnet"}}}).model_params.decoder
    assert dec.upsample_rates == [10, 6]
    assert dec.upsample_kernel_sizes == [20, 12]
    assert (dec.gen_istft_n_fft, dec.gen_istft_hop_size) == (20, 5)
    dec = load_config({"model_params": {"decoder": {
        "type": "vocos"}}}).model_params.decoder
    assert (dec.gen_istft_n_fft, dec.gen_istft_hop_size) == (1200, 300)
    dec = load_config({"model_params": {"decoder": {
        "type": "istftnet", "upsample_rates": [8, 8]}}}).model_params.decoder
    assert dec.upsample_rates == [8, 8]  # explicit value wins
    dec = load_config({"model_params": {"decoder": {
        "type": "hifigan"}}}).model_params.decoder
    assert dec.upsample_rates == [10, 5, 3, 2]


def test_unknown_keys_tolerated():
    cfg = load_config({"model_params": {"decoder": {"type": "hifigan"}},
                       "some_future_key": 42})
    assert cfg.model_params.decoder.type == "hifigan"
