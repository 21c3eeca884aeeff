from .fitc import (
    InducingState,
    ModelState,
    TrainedState,
    calc_inducing,
    calc_means,
    calc_model,
    calc_trained,
    choose_kmeans_inputs,
    choose_n_first_inputs,
    choose_n_random_inputs,
    co_variance_coeffs,
    log_evidence,
    update_sigma2,
)
from .exact import (
    ExactModel,
    ExactTrained,
    calc_exact,
    covariances_exact,
    exact_trained,
    fit_exact,
    log_evidence_exact,
    loo_log_likelihood,
    loo_objective_exact,
    loo_posterior,
    predict_means_exact,
    predict_variances_exact,
)
from .iterative import (
    IterTrained,
    NystromPrecond,
    evidence_grads_iter,
    fit_iter,
    iter_trained,
    kernel_matvec,
    nystrom_precond,
    pcg,
    predict_means_iter,
    predict_variances_iter,
)
from .loo import (
    loo_log_likelihood as loo_log_likelihood_fitc,
    loo_objective as loo_objective_fitc,
    loo_posterior as loo_posterior_fitc,
)
from .predict import (
    CoVariancePredictor,
    MeanPredictor,
    co_variance_predictor,
    covariances_fic,
    covariances_fic_model_inputs,
    covariances_fitc,
    covariances_fitc_model_inputs,
    mean_predictor,
    predict_mean_one,
    predict_means,
    predict_variance_one,
    predict_variances,
    variances_model_inputs,
)
from .multitask import (
    batched_log_evidence,
    batched_value_and_grad,
    multi_start,
)
from .pitc import (
    pitc_coeffs,
    pitc_log_evidence,
    pitc_stream_stats,
)
from .classify import (
    classify_log_evidence,
    classify_predict,
    fit_classify,
    laplace_mode,
)
from .classify_ep import (
    ep_log_evidence,
    ep_predict,
    fit_classify_ep,
)
from .classify_multi import (
    fit_classify_multi,
    multiclass_log_evidence,
    multiclass_predict,
)
from .classify_stream import (
    stream_classify_log_evidence,
    stream_classify_predict,
)
from .classify_multi_stream import (
    stream_multiclass_log_evidence,
    stream_multiclass_predict,
    stream_multiclass_state,
)
from .binomial import (
    binomial_log_evidence,
    binomial_predict,
    fit_binomial,
)
from .negbin import (
    fit_negbin,
    negbin_log_evidence,
    negbin_predict,
)
from .ordinal import (
    cutpoints_from_raw,
    default_cutpoint_raw,
    fit_ordinal,
    ordinal_log_evidence,
    ordinal_predict,
)
from .robust import (
    fit_t,
    t_elbo,
    t_em_sweeps,
    t_posterior_moments,
    t_predict,
    t_select_nu,
)
from .poisson import (
    fit_poisson,
    poisson_log_evidence,
    poisson_predict,
)
from .warped import (
    WarpParams,
    default_warp_params,
    warp,
    warp_deriv,
    warp_inv,
    warped_log_evidence,
    warped_predict_mean,
    warped_predict_median,
    warped_predict_quantile,
)
from .online import (
    OnlineState,
    online_downdate,
    online_init,
    online_log_evidence,
    online_predictors,
    online_update,
)
from .sample import (CovSampler, Sampler, cov_sample, cov_sampler,
                     sample, sample_fic_blocked, sampler)
from .stats import ClassifyStats, Stats, calc_classify_stats, calc_stats
from .streaming import (
    StreamingTrained,
    predict_means_blocked,
    predict_variances_blocked,
    streaming_coeffs,
    streaming_log_evidence,
    streaming_trained,
)

__all__ = [n for n in dir() if not n.startswith("_")]
