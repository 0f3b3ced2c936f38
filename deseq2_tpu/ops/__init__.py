"""Batched TPU kernels over the genes axis.

Every per-gene serial loop in the reference's C++ (src/DESeq2.cpp) becomes
a batched, masked, fixed-control-flow JAX computation here:

- fitBeta (src/DESeq2.cpp:282-465)  -> irls.fit_beta
- fitDisp (src/DESeq2.cpp:163-277)  -> disp.fit_disp_line_search
- fitDispGrid (src/DESeq2.cpp:468-513) -> disp.fit_disp_grid
- log/dlog/d2log_posterior (src/DESeq2.cpp:31-158) -> disp.log_posterior etc.
"""
