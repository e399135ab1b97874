/* Test UMAT: isotropic linear (hypo)elasticity, Abaqus conventions.
 *
 * Our own fixture for exercising the UMAT interface (the reference keeps
 * a comparable Fortran example under src/umat_tests/).  props = [E, nu].
 *
 * Build: gcc -O2 -shared -fPIC -o libumat_elastic.so umat_elastic.c
 */

void umat_(double* stress, double* statev, double* ddsdde, double* sse,
           double* spd, double* scd, double* rpl, double* ddsddt,
           double* drplde, double* drpldt, double* stran, double* dstran,
           double* time, double* dtime, double* temp, double* dtemp,
           double* predef, double* dpred, char* cmname, int* ndi,
           int* nshr, int* ntens, int* nstatv, double* props, int* nprops,
           double* coords, double* drot, double* pnewdt, double* celent,
           double* dfgrd0, double* dfgrd1, int* noel, int* npt, int* layer,
           int* kspt, int* kstep, int* kinc) {
  (void)statev; (void)sse; (void)spd; (void)scd; (void)rpl; (void)ddsddt;
  (void)drplde; (void)drpldt; (void)stran; (void)time; (void)temp;
  (void)dtemp; (void)predef; (void)dpred; (void)cmname; (void)ndi;
  (void)nshr; (void)nstatv; (void)nprops; (void)coords; (void)drot;
  (void)pnewdt; (void)celent; (void)dfgrd0; (void)dfgrd1; (void)noel;
  (void)npt; (void)layer; (void)kspt; (void)kstep; (void)kinc;
  (void)dtime;

  const double E = props[0];
  const double nu = props[1];
  const double lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu));
  const double mu = E / (2.0 * (1.0 + nu));
  const int n = *ntens; /* 6: [11,22,33,12,13,23], engineering shear */

  /* ddsdde is Fortran column-major (6,6); symmetric here so moot */
  for (int i = 0; i < n * n; ++i) ddsdde[i] = 0.0;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) ddsdde[i * 6 + j] = lam + (i == j ? 2.0 * mu : 0.0);
  for (int i = 3; i < 6; ++i) ddsdde[i * 6 + i] = mu;

  for (int i = 0; i < n; ++i) {
    double ds = 0.0;
    for (int j = 0; j < n; ++j) ds += ddsdde[j * 6 + i] * dstran[j];
    stress[i] += ds;
  }
}
