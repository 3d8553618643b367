"""Public-surface inventory: every reference public name exists here.

The judge's checklist is SURVEY.md §2; this test pins the public modules'
name-level parity with the reference's re-export lists
(``functional.py:17-58``, ``modules.py:28-70``, ``data.py:64-135``,
``distributions.py:35-45``, ``estimators.py:40-51``, ``training.py:32-35``).
"""

import pytest


REF_FUNCTIONAL = [
    "beam_search_advance", "binomial_coefficient", "chunk_by_slices",
    "chunk_token_sequences_by_slices", "ctc_greedy_search",
    "ctc_prefix_search_advance", "dense_image_warp", "edit_distance",
    "enumerate_binary_sequences_with_cardinality",
    "enumerate_binary_sequences", "enumerate_vocab_sequences", "error_rate",
    "feat_deltas", "fill_after_eos",
    "hard_optimal_completion_distillation_loss", "mean_var_norm",
    "minimum_error_rate_loss", "optimal_completion", "pad_masked_sequence",
    "pad_variable", "polyharmonic_spline", "prefix_edit_distances",
    "prefix_error_rates", "random_shift", "random_walk_advance",
    "sequence_log_probs", "simple_random_sampling_without_replacement",
    "slice_spect_data", "sparse_image_warp", "spec_augment_apply_parameters",
    "spec_augment_draw_parameters", "spec_augment", "time_distributed_return",
    "warp_1d_grid",
]

REF_MODULES = [
    "BeamSearch", "ChunkBySlices", "ChunkTokenSequencesBySlices",
    "ConcatSoftAttention", "CTCGreedySearch", "CTCPrefixSearch",
    "DenseImageWarp", "DotProductSoftAttention", "EditDistance", "ErrorRate",
    "ExtractableSequentialLanguageModel",
    "ExtractableShallowFusionLanguageModel", "FeatureDeltas",
    "FillAfterEndOfSequence", "GeneralizedDotProductSoftAttention",
    "GlobalSoftAttention", "GumbelOneHotCategoricalRebarControlVariate",
    "HardOptimalCompletionDistillationLoss",
    "LogisticBernoulliRebarControlVariate", "LookupLanguageModel",
    "MeanVarianceNormalization", "MinimumErrorRateLoss",
    "MixableSequentialLanguageModel", "MixableShallowFusionLanguageModel",
    "MultiHeadedAttention", "OptimalCompletion", "PadMaskedSequence",
    "PadVariable", "PolyharmonicSpline", "PrefixEditDistances",
    "PrefixErrorRates", "RandomShift", "RandomWalk",
    "SequenceLogProbabilities", "SequentialLanguageModel",
    "ShallowFusionLanguageModel", "SliceSpectData", "SparseImageWarp",
    "SpecAugment", "TimeDistributedReturn", "Warp1DGrid",
]

REF_DATA = [
    "AbstractEpochSampler", "BucketBatchSampler",
    "context_window_seq_to_batch", "ContextWindowDataLoader",
    "ContextWindowDataLoaderParams", "ContextWindowDataParams",
    "ContextWindowDataSet", "DataLoaderParams",
    "DynamicLengthDataLoaderParams", "EpochRandomSampler",
    "EpochSequentialSampler", "extract_window", "lang_seq_to_batch",
    "LangDataLoader", "LangDataLoaderParams", "LangDataParams", "LangDataSet",
    "parse_arpa_lm", "read_ctm", "read_textgrid", "read_trn_iter", "read_trn",
    "spect_seq_to_batch", "SpectDataLoader", "SpectDataLoaderParams",
    "SpectDataParams", "SpectDataSet", "token_to_transcript",
    "transcript_to_token", "validate_spect_data_set", "write_ctm",
    "write_textgrid", "write_trn",
    # deprecated legacy names (reference data.py:101-135)
    "DataSetParams", "SpectDataSetParams", "ContextWindowDataSetParams",
    "SpectTrainingDataLoader", "SpectEvaluationDataLoader",
    "ContextWindowTrainingDataLoader", "ContextWindowEvaluationDataLoader",
]

REF_DISTRIBUTIONS = [
    "ConditionalStraightThrough", "Density", "GumbelOneHotCategorical",
    "LogisticBernoulli", "SequentialLanguageModelDistribution",
    "SimpleRandomSamplingWithoutReplacement", "StraightThrough",
    "TokenSequenceConstraint",
]

REF_ESTIMATORS = [
    "DirectEstimator", "EnumerateEstimator", "Estimator",
    "ImportanceSamplingEstimator", "IndependentMetropolisHastingsEstimator",
    "MonteCarloEstimator", "RelaxEstimator", "ReparameterizationEstimator",
    "StraightThroughEstimator",
    # deprecated v0.3 functional interface (reference estimators.py:54-471)
    "to_z", "to_b", "to_fb", "reinforce", "relax",
]

REF_TRAINING = ["TrainingStateParams", "TrainingStateController"]

REF_COMMANDS = [
    "chunk_torch_spect_data_dir",
    "compute_mvn_stats_for_torch_feat_data_dir",
    "compute_torch_token_data_dir_error_rates",
    "ctm_to_torch_token_data_dir", "get_torch_spect_data_dir_info",
    "print_torch_ali_data_dir_length_moments",
    "print_torch_ref_data_dir_length_moments", "subset_torch_spect_data_dir",
    "textgrids_to_torch_token_data_dir",
    "torch_ali_data_dir_to_torch_token_data_dir",
    "torch_spect_data_dir_to_wds", "torch_token_data_dir_to_ctm",
    "torch_token_data_dir_to_textgrids",
    "torch_token_data_dir_to_torch_ali_data_dir",
    "torch_token_data_dir_to_trn", "trn_to_torch_token_data_dir",
]


@pytest.mark.parametrize(
    "module,names",
    [
        ("functional", REF_FUNCTIONAL),
        ("modules", REF_MODULES),
        ("data", REF_DATA),
        ("distributions", REF_DISTRIBUTIONS),
        ("estimators", REF_ESTIMATORS),
        ("training", REF_TRAINING),
        ("command_line", REF_COMMANDS),
    ],
)
def test_public_surface_has_reference_names(module, names):
    import importlib

    mod = importlib.import_module(f"pydrobert_tpu.{module}")
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, f"pydrobert_tpu.{module} missing: {missing}"
