/* HDF5 high-level API stub — see stubs/hdf5.h. */
#ifndef REF_ORACLE_HDF5_HL_H_
#define REF_ORACLE_HDF5_HL_H_
#include "hdf5.h"
#endif
