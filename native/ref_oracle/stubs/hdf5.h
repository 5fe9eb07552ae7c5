/* HDF5 type/function stubs (no libhdf5 headers in this image).  The oracle
 * never exercises the HDF5 weight path; all of these abort if reached
 * (definitions in hdf5_stubs.cpp). */
#ifndef REF_ORACLE_HDF5_H_
#define REF_ORACLE_HDF5_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef long long hid_t;
typedef int herr_t;
typedef unsigned long long hsize_t;

#define H5P_DEFAULT 0
#define H5F_ACC_RDONLY 0u
#define H5F_ACC_TRUNC 2u

hid_t H5Fopen(const char* name, unsigned flags, hid_t fapl);
hid_t H5Fcreate(const char* name, unsigned flags, hid_t fcpl, hid_t fapl);
herr_t H5Fclose(hid_t id);
hid_t H5Gopen2(hid_t loc, const char* name, hid_t gapl);
hid_t H5Gcreate2(hid_t loc, const char* name, hid_t lcpl, hid_t gcpl, hid_t gapl);
herr_t H5Gclose(hid_t id);
int H5Lexists(hid_t loc, const char* name, hid_t lapl);
int H5LTfind_dataset(hid_t loc, const char* name);

#ifdef __cplusplus
}
#endif
#endif
