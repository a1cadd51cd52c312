/* Serial stub for OpenCilk: cilk_for degrades to a plain for loop (the
 * reference guards correctness on this being a drop-in — each iteration
 * writes a distinct pre-sized slot, kmer_set.cpp:123-131). */
#ifndef SKS_SHIM_CILK_H
#define SKS_SHIM_CILK_H
#define cilk_for for
#define cilk_spawn
#define cilk_sync
#endif
