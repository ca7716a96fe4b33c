! tpumd Fortran API — mirrors the reference's fortran/lammps.f90
! surface for the C symbols exported by libtpumd.so (tpumd/capi/).
!
! Usage (same shape as the reference's LAMMPS Fortran module):
!
!     use tpumd
!     type(tpumd_handle) :: lmp
!     lmp = tpumd_open()
!     call lmp%command("units lj")
!     call lmp%file("in.lj")
!     print *, lmp%get_natoms(), lmp%get_thermo("temp")
!     call lmp%close()
!
! Build:  gfortran -c tpumd.f90 && gfortran your.f90 tpumd.o -ltpumd
! (libtpumd.so is produced by `python -m tpumd.capi.build`; it embeds
! the Python engine, so the process must be able to locate libpython.)
!
! NOTE: no Fortran compiler ships in the development image, so this
! module is validated structurally against the C header contract only;
! the underlying C symbols are covered by tests/test_capi.py.

module tpumd
  use, intrinsic :: iso_c_binding, only: c_ptr, c_char, c_int, c_double, &
                                         c_null_ptr, c_null_char, c_loc
  implicit none
  private

  public :: tpumd_handle, tpumd_open

  type tpumd_handle
    type(c_ptr) :: handle = c_null_ptr
  contains
    procedure :: close => tpumd_close
    procedure :: command => tpumd_command
    procedure :: commands_string => tpumd_commands_string
    procedure :: file => tpumd_file
    procedure :: get_natoms => tpumd_get_natoms
    procedure :: get_thermo => tpumd_get_thermo
    procedure :: version => tpumd_version
    procedure :: gather_atoms => tpumd_gather_atoms
    procedure :: scatter_atoms => tpumd_scatter_atoms
  end type tpumd_handle

  interface
    function c_lammps_open_no_mpi(argc, argv, ptr) bind(c, name='lammps_open_no_mpi')
      import :: c_ptr, c_int
      integer(c_int), value :: argc
      type(c_ptr), value :: argv, ptr
      type(c_ptr) :: c_lammps_open_no_mpi
    end function

    subroutine c_lammps_close(h) bind(c, name='lammps_close')
      import :: c_ptr
      type(c_ptr), value :: h
    end subroutine

    subroutine c_lammps_command(h, cmd) bind(c, name='lammps_command')
      import :: c_ptr, c_char
      type(c_ptr), value :: h
      character(kind=c_char), dimension(*) :: cmd
    end subroutine

    subroutine c_lammps_commands_string(h, s) bind(c, name='lammps_commands_string')
      import :: c_ptr, c_char
      type(c_ptr), value :: h
      character(kind=c_char), dimension(*) :: s
    end subroutine

    subroutine c_lammps_file(h, path) bind(c, name='lammps_file')
      import :: c_ptr, c_char
      type(c_ptr), value :: h
      character(kind=c_char), dimension(*) :: path
    end subroutine

    function c_lammps_get_natoms(h) bind(c, name='lammps_get_natoms')
      import :: c_ptr, c_double
      type(c_ptr), value :: h
      real(c_double) :: c_lammps_get_natoms
    end function

    function c_lammps_get_thermo(h, name) bind(c, name='lammps_get_thermo')
      import :: c_ptr, c_char, c_double
      type(c_ptr), value :: h
      character(kind=c_char), dimension(*) :: name
      real(c_double) :: c_lammps_get_thermo
    end function

    function c_lammps_version(h) bind(c, name='lammps_version')
      import :: c_ptr, c_int
      type(c_ptr), value :: h
      integer(c_int) :: c_lammps_version
    end function

    subroutine c_lammps_gather_atoms(h, name, dtype, count, data) &
        bind(c, name='lammps_gather_atoms')
      import :: c_ptr, c_char, c_int
      type(c_ptr), value :: h, data
      character(kind=c_char), dimension(*) :: name
      integer(c_int), value :: dtype, count
    end subroutine

    subroutine c_lammps_scatter_atoms(h, name, dtype, count, data) &
        bind(c, name='lammps_scatter_atoms')
      import :: c_ptr, c_char, c_int
      type(c_ptr), value :: h, data
      character(kind=c_char), dimension(*) :: name
      integer(c_int), value :: dtype, count
    end subroutine
  end interface

contains

  function f2c(s) result(cs)
    character(len=*), intent(in) :: s
    character(kind=c_char, len=:), allocatable :: cs
    cs = trim(s) // c_null_char
  end function f2c

  function tpumd_open() result(self)
    type(tpumd_handle) :: self
    self%handle = c_lammps_open_no_mpi(0_c_int, c_null_ptr, c_null_ptr)
  end function tpumd_open

  subroutine tpumd_close(self)
    class(tpumd_handle), intent(inout) :: self
    call c_lammps_close(self%handle)
    self%handle = c_null_ptr
  end subroutine tpumd_close

  subroutine tpumd_command(self, cmd)
    class(tpumd_handle), intent(in) :: self
    character(len=*), intent(in) :: cmd
    call c_lammps_command(self%handle, f2c(cmd))
  end subroutine tpumd_command

  subroutine tpumd_commands_string(self, s)
    class(tpumd_handle), intent(in) :: self
    character(len=*), intent(in) :: s
    call c_lammps_commands_string(self%handle, f2c(s))
  end subroutine tpumd_commands_string

  subroutine tpumd_file(self, path)
    class(tpumd_handle), intent(in) :: self
    character(len=*), intent(in) :: path
    call c_lammps_file(self%handle, f2c(path))
  end subroutine tpumd_file

  function tpumd_get_natoms(self) result(n)
    class(tpumd_handle), intent(in) :: self
    real(c_double) :: n
    n = c_lammps_get_natoms(self%handle)
  end function tpumd_get_natoms

  function tpumd_get_thermo(self, name) result(v)
    class(tpumd_handle), intent(in) :: self
    character(len=*), intent(in) :: name
    real(c_double) :: v
    v = c_lammps_get_thermo(self%handle, f2c(name))
  end function tpumd_get_thermo

  function tpumd_version(self) result(v)
    class(tpumd_handle), intent(in) :: self
    integer(c_int) :: v
    v = c_lammps_version(self%handle)
  end function tpumd_version

  subroutine tpumd_gather_atoms(self, name, count, data)
    class(tpumd_handle), intent(in) :: self
    character(len=*), intent(in) :: name
    integer(c_int), intent(in) :: count
    real(c_double), intent(inout), target :: data(:)
    call c_lammps_gather_atoms(self%handle, f2c(name), 1_c_int, count, &
                               c_loc(data))
  end subroutine tpumd_gather_atoms

  subroutine tpumd_scatter_atoms(self, name, count, data)
    class(tpumd_handle), intent(in) :: self
    character(len=*), intent(in) :: name
    integer(c_int), intent(in) :: count
    real(c_double), intent(inout), target :: data(:)
    call c_lammps_scatter_atoms(self%handle, f2c(name), 1_c_int, count, &
                                c_loc(data))
  end subroutine tpumd_scatter_atoms

end module tpumd
